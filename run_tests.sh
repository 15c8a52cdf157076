#!/usr/bin/env bash
# CPU test runner: disables the axon TPU tunnel registration (sitecustomize
# connects every python process to the TPU relay; concurrent CPU-only test
# processes would contend for it) and forces the CPU backend with 8 virtual
# devices for sharding tests.
set -e
cd "$(dirname "$0")"
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
