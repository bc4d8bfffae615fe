import os

# Tests always run on a virtual 8-device CPU mesh so multi-chip sharding logic
# is exercised without TPU hardware (SURVEY.md §4 test strategy).
#
# NOTE: a site .pth hook pre-imports jax._src at interpreter startup, which
# freezes the JAX_PLATFORMS env var (= axon, the TPU tunnel) into the config
# default — so the env var must be overridden via jax.config, not os.environ.
# XLA_FLAGS is read later (at backend init), so the env route works for it.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: repeat test runs skip XLA compiles (critical on
# this 1-core host; the full-model graphs take minutes to compile cold).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
