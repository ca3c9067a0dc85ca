"""Test configuration: CPU backend with 8 virtual devices, 64-bit floats.

The reference test oracle asserts solutions to 1e-6..1e-8, which requires
f64 arithmetic; the multi-device tests exercise sharding on a virtual
8-device CPU mesh (matching the driver's dryrun environment).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# Route all eager/default computation to the host CPU: the accelerator in
# this environment sits behind a remote tunnel and would turn each eager op
# into a network round trip.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU's compiler segfaults nondeterministically once a process
    has accumulated ~150 compiled programs (observed twice, always while
    compiling the large vmapped sparse-batch cores late in the suite;
    each crashing program compiles fine in a fresh process or after a
    cache clear).  Dropping compiled executables between modules keeps
    the full suite inside the safe envelope at a small recompile cost."""
    jax.clear_caches()
    yield
