"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors how the driver validates multi-chip sharding without real chips.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The parent environment may export JAX_PLATFORMS=axon (the tunneled TPU
# plugin) and the plugin wins over the env var — force CPU in-process so the
# suite runs hermetically on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast tier (`pytest -m fast`, <2 min on the 1-core host): whole modules whose
# compile footprint is small. Compile-heavy modules (train steps, UNet/VQVAE
# forwards, checkpoints, torch parity) stay out; individual cheap tests there
# can opt in with @pytest.mark.fast.
FAST_MODULES = {
    "test_schedule", "test_collate", "test_constraints", "test_gcn",
    "test_chamfer", "test_conv3d", "test_diffusion", "test_groupnorm",
    "test_io_misc", "test_eval_extras", "test_export_fid", "test_mesh_ops",
    "test_sgfront_reader", "test_flash_attention",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
