import os

# Run the test suite on a virtual 8-device CPU mesh with float64 enabled so
# parity checks against the sequential oracle are exact; TPU execution is
# exercised by bench.py / __graft_entry__.py.
# force: the driver environment exports JAX_PLATFORMS=axon (the TPU
# tunnel), which would silently run the whole suite on the single TPU chip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not enough: the axon TPU plugin registers itself
# regardless, so pin the platform through the config as well
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

from lp_mp_tpu import config  # noqa: E402

config.set_dtype("float64")

# persistent compilation cache: repeat suite runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
