"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising multi-chip SPMD code without
hardware (SURVEY.md §4): force the host platform and split it into 8
virtual devices. Environment variables alone are not enough in this image
(a site hook re-registers an accelerator platform programmatically), so the
platform is forced through jax.config before any backend initializes.
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """Session-wide miniature dataset (see rxtpu.data.synthetic)."""
    from rxtpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("synthdata")
    manifest = make_synthetic_dataset(str(root))
    return str(root), manifest


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("virtual 8-device CPU mesh unavailable")
    return devs
