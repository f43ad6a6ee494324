"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; per SURVEY.md §4 we validate
sharding with ``xla_force_host_platform_device_count`` instead.
Must set the env vars before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import pytest

import jax

# The driver environment pre-sets JAX_PLATFORMS=axon (TPU) and the plugin
# wins over the env var — force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")
# This XLA:CPU build computes DEFAULT-precision f32 convs/matmuls at
# bf16-level accuracy (~1e-2 abs on unit-scale data). Parity tests need
# true f32: force HIGHEST. (TPU runs keep the fast default; precision is a
# per-model knob there.)
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference/FastDiffSR")


def reference_available() -> bool:
    return REFERENCE_ROOT.is_dir()


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference repo not mounted at /root/reference",
)


@pytest.fixture(scope="session")
def reference_root():
    if not reference_available():
        pytest.skip("reference repo unavailable")
    return REFERENCE_ROOT
