import os

# Tests run on CPU with a virtual 8-device mesh for sharding tests;
# f64 everywhere.  Force these (the ambient environment pins
# JAX_PLATFORMS to the axon TPU tunnel, which would remote-compile
# every tiny test kernel).
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon site customization pins jax_platforms="axon,cpu" through
# jax.config (the env var alone is ignored); force CPU the same way.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test")
