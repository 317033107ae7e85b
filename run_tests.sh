#!/bin/sh
# Test launcher. PALLAS_AXON_POOL_IPS must be cleared BEFORE the
# interpreter starts: the axon TPU-tunnel plugin registers itself from
# sitecustomize (which runs before conftest.py can touch the env), steals
# platform selection from JAX_PLATFORMS=cpu, and serialises the whole
# suite onto the single tunnelled TPU chip.
#
# The suite is XLA-compile-bound; pytest-xdist across the host cores
# overlaps compiles of independent test files. Pass -n 0 to force a
# serial run.
# VPP_FULL_TESTS=1: include the full-size sharded-vs-single-device
# bit-exactness run (~37 s) — the strongest multi-device correctness
# evidence belongs in the default suite.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu VPP_FULL_TESTS=1 \
    python -m pytest tests/ -n "$(nproc)" "$@"
