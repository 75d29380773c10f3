"""Test config: force CPU with 8 virtual devices so multi-chip sharding
semantics are testable without hardware (SURVEY.md §4: the analogue of the
reference's spawn-on-localhost distributed tests)."""

import os

# force-override: the axon TPU plugin sets JAX_PLATFORMS=axon in the outer
# env; tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU hard-aborts (F ... rendezvous.cc Termination timeout) when the
    # 8 virtual-device threads don't all reach a collective within 40 s —
    # on a 1-core CI host a heavy jitted step (e.g. detection training)
    # can legitimately keep one device thread busy longer than that while
    # the others wait.  Raise the warn/terminate timeouts; slow is fine,
    # SIGABRT is not.
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides jax_platforms via
# jax.config at interpreter start; force it back to CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()
