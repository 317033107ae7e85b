import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from vpp_tpu.core.image import from_array
from vpp_tpu.algorithms.pyramid import pyramid
from vpp_tpu.algorithms.fast import fast9
from vpp_tpu.algorithms.flow import semi_dense_optical_flow
from vpp_tpu.algorithms.video_extruder import VideoExtruderConfig, video_extruder_init, video_extruder_update

H, W = 480, 640
rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.randint(0,255,(H,W)).astype(np.float32))
f2 = jnp.asarray(rng.randint(0,255,(H,W)).astype(np.float32))
cfg = VideoExtruderConfig(capacity=4096, detect_k=2048, nscales=3, winsize=9,
                          keypoint_spacing=10, detector_period=5, detector_th=10)
B = max(3, cfg.winsize)
N = 100

def scan_time(name, step, init):
    """step: (carry, x) -> (carry, None); time N iters on device."""
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(step, c, jnp.arange(N))
        return c
    r = jax.block_until_ready(run(init))
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        ts.append(time.perf_counter()-t0)
    print(f"{name:30s} {sorted(ts)[2]/N*1e3:8.3f} ms/iter")

# pyramid
def pyr_step(c, i):
    p = pyramid(from_array(c + i, border=B, border_mode="mirror"), cfg.nscales, border=B)
    return p.levels[0].data[B:-B, B:-B], None
scan_time("pyramid(3lvl)", pyr_step, f1)

# fast9
def fast_step(c, i):
    kp, score, n = fast9(from_array(c + i, border=B, border_mode="mirror"), 10, blockwise=True, block_size=10, k=2048)
    # float dependency: int score.sum()*0 would be folded to 0 by XLA's
    # algebraic simplifier, dead-code-eliminating the whole fast9 call
    return c + score.astype(jnp.float32).sum() * 1e-30, None
scan_time("fast9 blockwise", fast_step, f1)

# flow (pyramids built inside)
K = 4096
pos = jnp.asarray(rng.rand(K,2).astype(np.float32) * [H-1,W-1])
valid = jnp.ones((K,), bool)
def flow_step(c, i):
    m, d, ok = semi_dense_optical_flow(pos, valid,
        from_array(f1 + c*0, border=B, border_mode="mirror"),
        from_array(f2 + i, border=B, border_mode="mirror"),
        winsize=cfg.winsize, nscales=cfg.nscales, propagation=2, patchsize=5)
    return c + m.sum()*0, None
scan_time("semi_dense_flow(+pyr)", flow_step, jnp.float32(0))

# full tracker update
state = video_extruder_init(cfg)
def upd_step(s, i):
    s2 = video_extruder_update(s,
        from_array(f1 + i, border=B, border_mode="mirror"),
        from_array(f2 + i, border=B, border_mode="mirror"), cfg)
    return s2, None
scan_time("video_extruder_update", upd_step, state)
