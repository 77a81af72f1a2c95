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

# belt-and-braces: if a pytest plugin imported jax before this conftest,
# the JAX_PLATFORMS env assignment above came too late — force the
# platform through the config as well (otherwise backend discovery may
# probe the axon TPU tunnel and hang/raise when it is down)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Per-configuration suite gating (the reference gates its test lists per
# build config too — TESTEXAMPLES_C vs _MPIUNI etc., SURVEY.md §4).
# Through the axon dev tunnel every distinct jit costs ~10-60 s of remote
# compile, so that configuration runs a smoke subset: golden-output
# parity, kernels-vs-scipy, host-side plan code. The FULL suite runs in
# any normal environment (CPU mesh via scripts/test_cpu.sh, real TPU
# pods, CI).
# ---------------------------------------------------------------------------
# the tunnel advertises platform "tpu"; the remote-compile env flag plus
# an actually-selected tpu backend marks the slow-compile configuration
# (the CPU-mesh runs inherit the env var but select the cpu backend).
# When the tunnel is DOWN the axon plugin raises from backend discovery
# even under JAX_PLATFORMS=cpu — treat that as "not on the tunnel" so
# the CPU suite still runs.
_ON_AXON_TUNNEL = False
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
    try:
        _ON_AXON_TUNNEL = jax.default_backend() == "tpu"
    except RuntimeError:
        _ON_AXON_TUNNEL = False

_AXON_SMOKE_FILES = {
    "test_core.py", "test_golden.py", "test_mat.py", "test_stencil.py",
    "test_io.py", "test_native.py", "test_vec.py", "test_datafiles.py",
}

# debug-callback streams deadlock through the tunnel's io path
_AXON_SKIP_NAMES = ("exact_output_text",)


def pytest_collection_modifyitems(config, items):
    if not _ON_AXON_TUNNEL:
        return
    import pytest

    skip = pytest.mark.skip(
        reason="axon tunnel: remote-compile-heavy; covered by the full "
               "suite under scripts/test_cpu.sh and by dryrun_multichip")
    for item in items:
        name_hit = any(s in item.name for s in _AXON_SKIP_NAMES)
        if (os.path.basename(str(item.fspath)) not in _AXON_SMOKE_FILES
                or name_hit):
            item.add_marker(skip)


# ---------------------------------------------------------------------------
# XLA's CPU compiler segfaults (backend_compile_and_load) when compiling
# the large IMEX/Rosenbrock while_loop programs late in a single long
# pytest process (~550 accumulated jitted executables) — reproducibly at
# tests/test_ts_imex.py in a full run, never standalone. Bound the
# compiler's accumulated state by dropping compiled-executable caches
# between test modules; per-module recompiles on CPU are cheap.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
