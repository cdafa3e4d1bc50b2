"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's fake-NUMA trick (ref: scheduler/topology.hpp:64-78)
for testing multi-device logic without hardware; the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

# XLA:CPU's thunk runtime JIT-loads ~3 tiny anonymous mappings per emitted
# kernel and NEVER unmaps them; a full-suite run accumulates >65k mappings
# and the next LLVM compile segfaults when mmap fails (default
# vm.max_map_count is 65530).  Diagnosed via /proc/<pid>/maps high-water
# snapshots: ~16.4k identical (r--p 4K, r-xp 4K, rw-p 16K) triples at the
# crash point.  Raise the limit when we can; otherwise warn loudly so the
# failure mode is recognizable.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _limit = int(_f.read())
    if _limit < 262144:
        try:
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write("1048576")
        except OSError:
            import warnings

            warnings.warn(
                f"vm.max_map_count={_limit} is too low for a full-suite run "
                "(XLA:CPU JIT mappings accumulate); segfaults during XLA "
                "compiles mean mmap exhaustion — raise the sysctl or run "
                "pytest with -n <workers>."
            )
except OSError:
    pass
# No persistent compile cache for CPU tests: XLA:CPU AOT deserialization
# trips a machine-feature check even for same-host round-trips (observed
# segfault in get_executable_and_time) — compile fresh, it's fast.
os.environ.setdefault("HYRISE_TPU_COMPILE_CACHE", "")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True)
def reset_database():
    """Per-test singleton reset (ref: test/base_test.hpp:41)."""
    from hyrise_tpu.database import Database

    Database.reset()
    yield
