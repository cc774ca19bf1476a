import os

# Tests run on a virtual 8-device CPU mesh; must be set before jax import.
# The axon TPU plugin registers itself from sitecustomize whenever
# PALLAS_AXON_POOL_IPS is set and then overrides JAX_PLATFORMS, so drop it.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
