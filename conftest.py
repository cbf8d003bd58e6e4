# Root conftest: configure JAX for tests.
#
# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# (tpu_restir/dist) are exercised without TPU hardware, per the project's
# test strategy (SURVEY.md §4, item 4: single-chip vs multi-chip parity).
import os

# Persistent compilation cache: XLA-CPU compiles on this machine are slow
# (~0.5-1 s per tiny executable), so caching across test runs cuts minutes
# off every pytest invocation.
_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))

# Force CPU unconditionally: the ambient environment presets
# JAX_PLATFORMS=axon (the tunneled TPU, 1 device, high dispatch latency)
# and a sitecustomize pre-imports jax, so env-var setdefault alone is too
# late — update jax.config directly (valid until a backend initializes).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
