#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
# The container's sitecustomize eagerly registers the axon TPU backend, so the
# overrides must be set at the shell level (before the interpreter starts).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
exec python -m pytest tests/ "$@"
