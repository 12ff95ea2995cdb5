"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware, per the
reference-framework test strategy adaptation in SURVEY.md §4 — env vars must
be set before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU with 8 virtual devices. Must be set before any `import jax`, and
# the axon TPU site-hook must be disabled (it would otherwise claim the
# single-tenant TPU tunnel for every python process, serializing/hanging
# concurrent runs).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon site-hook may have imported jax before us with JAX_PLATFORMS=axon
# baked in at import time — override through the config API as well.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pathlib

import numpy as np
import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


def _fixture(relpath: str):
    """Load a golden .npy fixture from the read-only reference checkout,
    skipping the test when unavailable (keeps the suite hermetic)."""
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        pytest.skip(f"reference fixture {relpath} not available")
    return np.load(path)


@pytest.fixture
def ref_fixture():
    return _fixture
