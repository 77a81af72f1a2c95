#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh (fast local compiles,
# exercises the distributed code paths). The axon sitecustomize pins the
# single-chip TPU backend, so scrub it from the environment.
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "${@:-tests/}" -q
