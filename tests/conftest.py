import os
import sys

# virtual 8-device CPU mesh for multi-chip sharding tests
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("CMBLENSING_TEST_TPU"):
    # CPU-only lane: pin jax to the CPU platform BEFORE the first
    # backend init. The remotely-tunneled TPU ("axon") plugin registers
    # itself at interpreter startup (sitecustomize, which also forces
    # JAX_PLATFORMS=axon) and its backend init BLOCKS INDEFINITELY when
    # the tunnel is down — which would hang the whole suite at the
    # first jax.devices() call. config.update after import outranks the
    # plugin's env override, so only the cpu backend ever initializes.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


@pytest.fixture(scope="session", autouse=True)
def _cpu_default_device():
    """Run the test suite on the CPU backend (the axon/TPU backend is
    reserved for benchmarks; tests mirror the reference's CPU/GPU
    switchable suite, test/runtests.jl:8-18)."""
    if os.environ.get("CMBLENSING_TEST_TPU"):
        yield
        return
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        yield


@pytest.fixture()
def x64():
    """Enable float64 within a test (for finite-difference checks)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)
