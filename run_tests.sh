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
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -n "$(nproc)" "$@"
