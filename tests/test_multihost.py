"""Multi-host launch recipe, actually executed (2 processes, gloo).

Runs evaluation/multihost_check.py as a subprocess: spawns two worker
processes that initialise jax.distributed via
vpp_tpu.parallel.mesh.distributed_mesh (the documented v5e-16 recipe,
gloo standing in for DCN), run the column-sharded flow over the global
8-device mesh, and require bit-equality with both the single-process
mesh and the single-device flow."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_multihost_two_process_flow():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, str(ROOT / "evaluation" / "multihost_check.py")],
        capture_output=True, timeout=600, env=env, cwd=str(ROOT))
    out = res.stdout.decode()
    assert res.returncode == 0, out + res.stderr.decode()
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["matches_single_process_mesh"] is True
    assert rec["matches_single_device"] is True
    assert rec["n_matched"] > 100
