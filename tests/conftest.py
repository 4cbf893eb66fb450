"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The image's sitecustomize registers the axon TPU platform and overrides
JAX_PLATFORMS, so env vars alone are not enough — we must update jax.config
after import, before any device use. Real-TPU runs happen only via bench.py;
tests are hermetic and exercise multi-chip sharding on host CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GENCORE_PLATFORM"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: identical kernel shapes recur across the suite
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "bench_data", "jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
