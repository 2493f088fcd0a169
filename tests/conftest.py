"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors how the driver validates multi-chip sharding without real chips.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# the suite is compile-bound and its programs run for microseconds: skip
# XLA's expensive optimization passes (measured: the DP-parity test drops
# 110 s → 67 s cold). Opt out with JAX_TEST_FULL_OPT=1.
if not os.environ.get("JAX_TEST_FULL_OPT"):
    if "xla_backend_optimization_level" not in flags:
        flags += " --xla_backend_optimization_level=0"
    if "xla_llvm_disable_expensive_passes" not in flags:
        flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The parent environment may export JAX_PLATFORMS=axon (the tunneled TPU
# plugin) and the plugin wins over the env var — force CPU in-process so the
# suite runs hermetically on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compile cache: the suite is compile-bound on the 1-core host
# (~33 min cold); cached re-runs skip the XLA work entirely
_cache = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

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

# Heavy tier: the compile-dominated middle (train steps, CLIs, torch parity,
# DP parity over the virtual mesh, checkpoint roundtrips). Excluding it gives
# an intermediate tier — `pytest -m "not heavy"` runs the fast modules plus
# the single-module forwards (UNet, VQ-VAE, samplers) in a few minutes, vs
# ~30 min for the full suite on the 1-core host. Tests individually marked
# @pytest.mark.fast inside a heavy module stay out of the heavy tier so the
# intermediate tier is a strict superset of the fast tier (ADVICE r3).
HEAVY_MODULES = {
    "test_train_step", "test_torch_parity", "test_parallel",
    "test_eval_cli", "test_import_checkpoint", "test_checkpoint",
    "test_v1full_trainer", "test_v1full_checkpoint", "test_plms_vqtrainer",
    "test_configs", "test_sgfront_fixture", "test_sgfront_adversarial",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        elif mod in HEAVY_MODULES and not item.get_closest_marker("fast"):
            item.add_marker(pytest.mark.heavy)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
