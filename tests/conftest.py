import os

# Tests always run on a virtual 8-device CPU mesh so multi-chip sharding logic
# is exercised without TPU hardware (SURVEY.md §4 test strategy).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
