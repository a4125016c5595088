"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths can be exercised without TPU hardware (the same
emulation the driver uses for dryrun_multichip).

Note: this image's sitecustomize registers an 'axon' TPU-tunnel PJRT plugin at
interpreter start and forces jax_platforms='axon,cpu' via jax.config — a plain
JAX_PLATFORMS=cpu env var is overridden. We must re-update the config after
importing jax, before any backend is initialized. Tests must never touch the
tunneled TPU: device grants are exclusive and concurrent claims serialize for
minutes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU programs in one process;
    keeping every executable alive eventually segfaults LLVM's JIT inside
    backend_compile (reproduced deterministically at ~96% of the suite,
    independent of which test lands there). Dropping the jit caches after
    each module keeps the live-executable count bounded; modules re-trace
    their own functions anyway.
    """
    yield
    jax.clear_caches()
