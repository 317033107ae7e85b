import time, numpy as np, jax, jax.numpy as jnp
from vpp_tpu.algorithms.flow import _cost_volume, _displacement_table
from vpp_tpu.ops.pallas_kernels import cost_volume_pallas, cost_volume_fits

H, W, B = 480, 640, 9
ws, patch = 9, 5
gh, gw = H // patch, W // patch
R = 5
disp, offsets = _displacement_table(R)
off = ws // 2 - patch // 2
r0 = B - off
hb, wb = H + 2 * B, W + 2 * B
fits = cost_volume_fits(hb, wb, r0, r0, ws, patch, gh, gw, R)
print("fits:", fits)

rng = np.random.RandomState(0)
a1 = jnp.asarray(rng.rand(hb, wb).astype(np.float32) * 255)
a2 = jnp.asarray(rng.rand(hb, wb).astype(np.float32) * 255)

xla = jax.jit(lambda a, b: _cost_volume(a, b, B, ws, patch, gh, gw, R, offsets))
v1 = np.asarray(jax.block_until_ready(xla(a1, a2)))
if fits:
    pal = jax.jit(lambda a, b: cost_volume_pallas(a, b, r0=r0, c0=r0, ws=ws, patch=patch, gh=gh, gw=gw, offsets=tuple(offsets)))
    v2 = np.asarray(jax.block_until_ready(pal(a1, a2)))
    print("max abs diff:", np.abs(v1 - v2).max(), "rel:", (np.abs(v1-v2)/(np.abs(v1)+1e-6)).max())
else:
    print("pallas config exceeds VMEM budget / bounds — skipping pallas runs")

def scan_time(name, fn, n=50):
    @jax.jit
    def run(a, b):
        def step(c, i):
            v = fn(a + c, b)
            return c + v[0,0,0]*0, None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
        return c
    jax.block_until_ready(run(a1, a2)); np.asarray(run(a1, a2))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(run(a1, a2)); ts.append(time.perf_counter()-t0)
    print(f"{name:20s} {sorted(ts)[2]/n*1e3:8.3f} ms/iter")

scan_time("xla cost_volume", lambda a,b: _cost_volume(a, b, B, ws, patch, gh, gw, R, offsets))
if fits:
    scan_time("pallas cost_volume", lambda a,b: cost_volume_pallas(a, b, r0=r0, c0=r0, ws=ws, patch=patch, gh=gh, gw=gw, offsets=tuple(offsets)))
