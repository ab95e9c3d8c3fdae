"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising multi-chip SPMD code without
hardware (SURVEY.md §4): force the host platform and split it into 8
virtual devices. Must run before the first ``import jax`` in any test.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """Session-wide miniature dataset (see rxtpu.data.synthetic)."""
    from rxtpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("synthdata")
    manifest = make_synthetic_dataset(str(root))
    return str(root), manifest
