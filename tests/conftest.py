"""Test environment: force CPU backend with 8 virtual devices.

Mirrors the driver's multi-chip dry-run environment so sharding tests run
anywhere.  The container's sitecustomize registers the TPU ('axon') PJRT
plugin at interpreter startup, so env vars alone are not enough — we must
re-point jax at CPU and clear any already-initialized backend.
"""

import os

import pytest

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _xb

    _xb.clear_backends()
except Exception:  # pragma: no cover - older jax versions
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full 136-test suite accumulates hundreds of distinct XLA:CPU
    executables in one process; past ~130 tests the NEXT compile
    deterministically segfaults inside backend_compile_and_load (an
    XLA:CPU/LLVM process-state issue — the same tests pass in any
    half-suite run).  Dropping executable caches per module keeps the
    compiler healthy; shared fixtures inside a module still reuse jits.
    """
    yield
    import jax

    jax.clear_caches()
