"""Test configuration.

Tests run on CPU with 8 virtual devices — the TPU analog of the
reference's mpiuni / oversubscribed-localhost-MPI testing strategy
(SURVEY.md §4): distributed correctness is exercised without a pod.
fp64 is enabled so convergence histories can be compared bit-for-
iteration against the reference's golden outputs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
