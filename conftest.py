"""Root conftest: make the in-repo package importable and force tests onto a
virtual 8-device CPU mesh (real TPU is reserved for bench runs; sharding is
validated without hardware per SURVEY.md §4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
