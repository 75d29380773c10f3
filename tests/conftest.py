"""Test config: force CPU with 8 virtual devices so multi-chip sharding
semantics are testable without hardware (SURVEY.md §4: the analogue of the
reference's spawn-on-localhost distributed tests)."""

import os

# force-override: the axon TPU plugin sets JAX_PLATFORMS=axon in the outer
# env; tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides jax_platforms via
# jax.config at interpreter start; force it back to CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()
