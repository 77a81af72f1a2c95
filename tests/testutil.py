"""Shared test helpers.

Multi-device tests need ≥2 devices: locally run them with
    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q
(see scripts/test_cpu.sh). Under the single-chip axon tunnel they skip —
that environment's relay only lowers Sum all-reduces, and with one
device there is nothing distributed to test anyway. This mirrors the
reference's testing split: serial runs everywhere, `mpiexec -n 2..5`
runs on hosts that have MPI (SURVEY.md §4).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

multidev = pytest.mark.skipif(
    jax.device_count() < 2,
    reason="needs >=2 devices (run via scripts/test_cpu.sh for the 8-dev CPU mesh)",
)


def mesh_1d(n: int = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    n = n or min(8, len(devs))
    return Mesh(np.array(devs[:n]), (axis,))
