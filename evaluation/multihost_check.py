"""Multi-host execution check — the v5e-16 launch recipe, actually run.

Spawns ``--num-processes`` worker processes on this machine (each with 4
virtual CPU devices), initialises ``jax.distributed`` through
``vpp_tpu.parallel.mesh.distributed_mesh`` exactly as the documented
two-host recipe does (gloo collectives stand in for DCN), runs the
production column-sharded semi-dense flow over the GLOBAL 8-device mesh,
and verifies the result is IDENTICAL to the single-process 8-device run
and to the plain single-device ``semi_dense_optical_flow``.

This is the piece a virtual-device dry run cannot cover: real
cross-process collectives, global array construction from process-local
shards, and the coordinator bootstrap.

Run:  python evaluation/multihost_check.py        # prints one JSON line
"""

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H, W = 64, 320
NSCALES, WINSIZE, PATCH, SN = 2, 7, 5, 3
NKP = 120
COORD = "127.0.0.1:8477"


def _scene():
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (H * 2, W * 2)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 1, mode="wrap"), (3, 3))
    sm = (sm.sum(axis=(2, 3)) // 9).astype(np.float32)
    f1 = sm[32:32 + H, 32:32 + W]
    f2 = sm[35:35 + H, 30:30 + W]
    rng2 = np.random.RandomState(12)
    pts = np.stack([rng2.randint(8, H - 8, NKP),
                    rng2.randint(40, W - 56, NKP)], -1).astype(np.float32)
    return f1, f2, pts


def _compute(mesh, out_path=None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vpp_tpu.parallel.sharded_tracker import sharded_semi_dense_flow

    f1n, f2n, pts = _scene()

    def gshard(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    f1 = gshard(f1n, P(None, "sp"))
    f2 = gshard(f2n, P(None, "sp"))
    pos = gshard(pts, P())
    val = gshard(np.ones((NKP,), bool), P())
    m, d, ok = sharded_semi_dense_flow(
        mesh, pos, val, f1, f2, winsize=WINSIZE, nscales=NSCALES,
        propagation=2, patchsize=PATCH, search_niters=SN)
    m = np.asarray(m)
    d = np.asarray(d)
    ok = np.asarray(ok)
    if out_path and jax.process_index() == 0:
        np.savez(out_path, m=m, d=d, ok=ok)
    return m, d, ok


def worker():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(sys.argv[2:])

    from vpp_tpu.parallel.mesh import distributed_mesh
    mesh = distributed_mesh((8,), ("sp",), coordinator=COORD,
                            num_processes=args.num_processes,
                            process_id=args.process_id)
    _compute(mesh, out_path=args.out)
    import jax
    if jax.process_index() == 0:
        print("worker 0 done", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
        return

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    nproc = 2
    with tempfile.TemporaryDirectory() as td:
        out = str(Path(td) / "mh.npz")
        procs = [subprocess.Popen(
            [sys.executable, __file__, "worker",
             "--process-id", str(i), "--num-processes", str(nproc),
             "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(nproc)]
        logs = [p.communicate(timeout=600)[0].decode() for p in procs]
        for i, p in enumerate(procs):
            if p.returncode != 0:
                print(logs[i])
                raise SystemExit(f"worker {i} failed rc={p.returncode}")
        mh = np.load(out)

    # single-process 8-device reference (same virtual-device geometry)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    m1, d1, ok1 = _compute(mesh)

    # plain single-device flow
    import jax.numpy as jnp
    from vpp_tpu.core import from_array
    from vpp_tpu.algorithms.flow import semi_dense_optical_flow
    f1n, f2n, pts = _scene()
    b = max(3, WINSIZE)
    i1 = from_array(jnp.asarray(f1n), border=b, border_mode="mirror")
    i2 = from_array(jnp.asarray(f2n), border=b, border_mode="mirror")
    m0, d0, ok0 = semi_dense_optical_flow(
        jnp.asarray(pts), jnp.ones((NKP,), bool), i1, i2,
        winsize=WINSIZE, nscales=NSCALES, propagation=2,
        patchsize=PATCH, search_niters=SN)

    same_mp = bool((mh["m"] == m1).all() and (mh["ok"] == ok1).all())
    same_sd = bool((mh["m"] == np.asarray(m0)).all()
                   and (mh["ok"] == np.asarray(ok0)).all())
    print(json.dumps({
        "metric": "multihost sharded flow (2 procs x 4 devices, gloo)",
        "matches_single_process_mesh": same_mp,
        "matches_single_device": same_sd,
        "n_matched": int(mh["ok"].sum()),
    }))
    assert same_mp and same_sd


if __name__ == "__main__":
    main()
