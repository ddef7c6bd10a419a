import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (bench.py runs on the real chip instead).
# NOTE: the environment pre-imports jax (axon site hook), so the platform must
# be switched via jax.config, not env vars; XLA_FLAGS is still read at backend
# init, which has not happened yet at conftest time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
