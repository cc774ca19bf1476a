import os

# Tests run on a virtual 8-device CPU mesh; XLA_FLAGS must be set before the
# CPU client initializes. The axon TPU plugin registers itself from
# sitecustomize (PYTHONPATH) whenever PALLAS_AXON_POOL_IPS is set — that runs
# BEFORE this conftest, so dropping the env var here is too late; instead
# force the platform through jax.config (wins over the plugin's env override
# as long as no backend has initialized yet).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
