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
