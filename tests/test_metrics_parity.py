"""Golden numeric parity for the MMD/COV/1-NN/JSD battery vs the REAL
reference implementation (scripts/compute_mmd_cov_1nn.py), imported from
/root/reference with its unavailable deps (open3d, CUDA exts) stubbed.

These are the statistics the paper reports — a wrong weighting or binning
here silently mis-ranks models, so every estimator is pinned to the
reference's output on random inputs.
"""

import importlib.util
import sys
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SCRIPT = "/root/reference/scripts/compute_mmd_cov_1nn.py"


@pytest.fixture(scope="module")
def ref():
    with mock.patch.dict(sys.modules, {"open3d": mock.MagicMock()}):
        spec = importlib.util.spec_from_file_location("ref_mmd", REF_SCRIPT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)      # CUDA exts fall back, prints ok
    return mod


def test_lgan_mmd_cov_parity(ref, rng):
    d = rng.rand(7, 5).astype(np.float32)
    from commonscenes_tpu.eval.mmd_cov_1nn import mmd_cov
    ours = mmd_cov(d)
    theirs = ref.lgan_mmd_cov(torch.from_numpy(d))
    np.testing.assert_allclose(ours["mmd"], float(theirs["lgan_mmd"]),
                               rtol=1e-6)
    np.testing.assert_allclose(ours["mmd_smp"],
                               float(theirs["lgan_mmd_smp"]), rtol=1e-6)
    np.testing.assert_allclose(ours["cov"], float(theirs["lgan_cov"]),
                               rtol=1e-6)


def test_1nn_parity_unbalanced_counts(ref, rng):
    """nx != ny: overall acc must be count-weighted (torch.eq(...).mean()),
    not the macro average of acc_t/acc_f."""
    nx, ny = 9, 4
    x = rng.randn(nx, 6)
    y = rng.randn(ny, 6) * 1.3 + 0.5

    def dmat(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1).astype(np.float32)

    dxx, dxy, dyy = dmat(x, x), dmat(x, y), dmat(y, y)
    from commonscenes_tpu.eval.mmd_cov_1nn import knn_1nn_accuracy
    ours = knn_1nn_accuracy(dxx, dxy, dyy)
    theirs = ref.knn(torch.from_numpy(dxx), torch.from_numpy(dxy),
                     torch.from_numpy(dyy), 1, sqrt=False)
    np.testing.assert_allclose(ours["1nn_acc"], float(theirs["acc"]),
                               atol=1e-6)
    np.testing.assert_allclose(ours["1nn_acc_real"], float(theirs["acc_t"]),
                               atol=1e-5)
    np.testing.assert_allclose(ours["1nn_acc_fake"], float(theirs["acc_f"]),
                               atol=1e-5)
    # with 9 vs 4 points these two weightings genuinely differ
    macro = 0.5 * (ours["1nn_acc_real"] + ours["1nn_acc_fake"])
    assert abs(macro - ours["1nn_acc"]) > 1e-6


def test_jsd_parity(ref, rng):
    """Sphere-clipped occupancy-grid JSD in bits, total-count distributions
    (latent_3d_points protocol)."""
    # clouds inside the unit sphere, incl. points near the boundary whose
    # rounded grid cell was sphere-clipped (exercises the NN fallback)
    def sphere_cloud(n):
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        r = 0.5 * rng.rand(n, 1) ** (1 / 3)
        return (v * r).astype(np.float32)

    s = np.stack([sphere_cloud(256) for _ in range(3)])
    r = np.stack([sphere_cloud(256) * 0.8 for _ in range(4)])
    from commonscenes_tpu.eval.mmd_cov_1nn import \
        jsd_between_point_cloud_sets
    ours = jsd_between_point_cloud_sets(s, r, resolution=28)
    theirs = ref.jsd_between_point_cloud_sets(s, r, resolution=28)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
    assert jsd_between_point_cloud_sets(s, s) == pytest.approx(0.0, abs=1e-12)


def test_emd_mean_convention_parity(ref, rng):
    """emd_hungarian == the reference torch fallback emd_approx (exact
    linear assignment, MEAN matched euclidean distance)."""
    x = rng.randn(2, 12, 3).astype(np.float32)
    y = rng.randn(2, 12, 3).astype(np.float32)
    from commonscenes_tpu.ops.emd import emd_hungarian
    ours = emd_hungarian(x, y)
    theirs = ref.emd_approx(torch.from_numpy(x), torch.from_numpy(y))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5)


def test_mean_maxabs_normalization_parity(ref, rng):
    pc = (rng.randn(500, 3) * np.array([0.2, 1.7, 0.6])).astype(np.float32)
    from commonscenes_tpu.ops.mesh import normalize_point_cloud
    ours = normalize_point_cloud(pc, "mean_maxabs")
    theirs = ref.normalization(pc.copy())
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_vertex_resample_matches_reference_stream(ref, rng):
    """sample_pc reseeds np.random with 42 per cloud; RandomState(42)
    reproduces the same permutation/randint stream."""
    from commonscenes_tpu.ops.mesh import resample_rows
    pc = rng.randn(700, 3).astype(np.float32)
    ours = resample_rows(pc, 300, np.random.RandomState(42))
    theirs = ref.sample_pc(pc.copy(), number=300)
    np.testing.assert_array_equal(ours, theirs)
    small = pc[:50]
    ours2 = resample_rows(small, 300, np.random.RandomState(42))
    theirs2 = ref.sample_pc(small.copy(), number=300)
    np.testing.assert_array_equal(ours2, theirs2)


def test_bbox_axis_normalization_invariants(rng):
    """The diversity normalize (eval_3dfront.py:783-796): every axis spans
    exactly [-1, 1] after bbox-centering + per-axis stretch."""
    from commonscenes_tpu.ops.mesh import normalize_point_cloud
    pc = rng.randn(400, 3) * np.array([0.1, 2.0, 5.0]) + np.array([3, -1, 9])
    out = normalize_point_cloud(pc.astype(np.float32), "bbox_axis")
    np.testing.assert_allclose(out.max(0), 1.0, atol=1e-5)
    np.testing.assert_allclose(out.min(0), -1.0, atol=1e-5)


def test_chamfer_matches_reference(ref, rng):
    """Squared bidirectional chamfer vs the reference torch distChamfer
    (compute_mmd_cov_1nn.py:12-22): dl = per-y-point min (dim 1),
    dr = per-x-point min (dim 2)."""
    import jax.numpy as jnp
    from commonscenes_tpu.ops.chamfer import chamfer, chamfer_distance
    # the reference helper assumes equal cloud sizes (its driver always
    # resamples to 5000); parity is checked on that contract
    x = rng.randn(2, 64, 3).astype(np.float32)
    y = rng.randn(2, 64, 3).astype(np.float32)
    dl, dr = ref.distChamfer(torch.from_numpy(x), torch.from_numpy(y))
    d_xy, d_yx = chamfer(jnp.asarray(x), jnp.asarray(y), use_pallas=False)
    np.testing.assert_allclose(np.asarray(d_xy), dr.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_yx), dl.numpy(), rtol=1e-4,
                               atol=1e-5)
    # scalar form = mean(dl) + mean(dr), the CD every metric consumes
    cd = chamfer_distance(jnp.asarray(x), jnp.asarray(y), use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(cd), (dl.mean(1) + dr.mean(1)).numpy(), rtol=1e-4)


def test_compute_all_metrics_has_emd_1nn(rng):
    import jax.numpy as jnp
    from commonscenes_tpu.eval.mmd_cov_1nn import compute_all_metrics
    sample = jnp.asarray(rng.randn(4, 32, 3).astype(np.float32))
    refp = jnp.asarray(rng.randn(3, 32, 3).astype(np.float32))
    res = compute_all_metrics(sample, refp, use_emd=True, use_pallas=False)
    for k in ("mmd_smp_cd", "mmd_smp_emd", "1nn_acc_emd",
              "1nn_acc_real_emd", "1nn_acc_fake_emd"):
        assert k in res and np.isfinite(res[k])
