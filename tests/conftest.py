import os

# Run all tests on a virtual multi-device CPU so multi-chip sharding paths
# can be exercised without TPU hardware; float64 everywhere. Note: the axon
# sitecustomize forces the TPU platform, so we must override via jax.config
# (the env var alone is not honored).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
