"""Root conftest: make the in-repo package importable and force tests onto a
virtual 8-device CPU mesh (the real TPU is reserved for bench runs; sharding
is validated without hardware per SURVEY.md §4).

Note: this environment preloads jax at interpreter start (PYTHONPATH
sitecustomize registering the 'axon' TPU backend), so setting JAX_PLATFORMS
via os.environ here is too late — use jax.config.update, which works until a
backend is initialized.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# ANYV2V_TESTS_TPU=1 keeps the real backend (for the on-chip kernel
# equivalence gate in tests/test_tpu_equivalence.py); everything else runs
# on the virtual CPU mesh.
if os.environ.get("ANYV2V_TESTS_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
# fp32 matmuls in tests must be exact-ish; TPU-style bf16 3-pass is fine for
# models but breaks golden comparisons.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the suite re-compiles the same jitted scans every
# run, and this host's single CPU core makes that the dominant cost
from anyv2v_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
