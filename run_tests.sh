#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
# Usage: ./run_tests.sh [pytest args]   |   ./run_tests.sh e2e [pytest args]
# The container's sitecustomize eagerly registers the axon TPU backend, so the
# overrides must be set at the shell level (before the interpreter starts).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
if [ "$1" = "e2e" ]; then
    shift
    exec python -m pytest tests/ -m e2e "$@"
fi
exec python -m pytest tests/ "$@"
