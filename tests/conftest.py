import os

# Force JAX onto a virtual 8-device CPU mesh so sharding tests run anywhere
# (the session environment may preset JAX_PLATFORMS to a TPU backend that
# ignores the env-var override, so use jax.config directly).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
