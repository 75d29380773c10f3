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

# persistent XLA:CPU compile cache: repeated suite runs skip most of the
# compile wall-clock.  The dir is keyed by a CPU-feature fingerprint
# because CPU AOT entries bake in the COMPILE machine's features and can
# SIGILL/SIGABRT when loaded on a different host (seen with a stale
# /tmp cache after a machine change).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        flags = next((ln for ln in f if ln.startswith("flags")), "")
    tag = hashlib.md5(flags.encode()).hexdigest()[:10]
except OSError:
    tag = "nofp"
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_tests_{tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Fast tier by default: skip slow-marked tests unless the user gave
    an explicit -m expression, or named a specific test node id (an
    addopts-level -m filter would silently deselect explicitly-requested
    tests and report green having run nothing)."""
    if config.getoption("-m"):
        return
    if any("::" in a for a in config.invocation_params.args):
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with -m slow, or name the test node id")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
