"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's fake-NUMA trick (ref: scheduler/topology.hpp:64-78)
for testing multi-device logic without hardware; the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# CPU compiles are fast; the persistent cache only adds AOT reload noise
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
