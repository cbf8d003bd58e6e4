# Root conftest: configure JAX for tests BEFORE jax is imported anywhere.
#
# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# (tpu_restir/dist) are exercised without TPU hardware, per the project's
# test strategy (SURVEY.md §4, item 4: single-chip vs multi-chip parity).
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
