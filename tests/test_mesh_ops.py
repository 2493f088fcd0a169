"""Marching-tetrahedra / surface-sampling / EMD / MMD-suite tests."""

import numpy as np
import jax.numpy as jnp

from commonscenes_tpu.data.synthetic import sphere_sdf
from commonscenes_tpu.eval.mmd_cov_1nn import (compute_all_metrics,
                                               knn_1nn_accuracy, mmd_cov)
from commonscenes_tpu.ops.emd import emd_hungarian, emd_sinkhorn
from commonscenes_tpu.ops.mesh import (marching_tetrahedra,
                                       sdf_to_point_cloud)


def test_sphere_surface_extraction():
    sdf = sphere_sdf(32, 0.6, trunc=1.0)
    verts, faces = marching_tetrahedra(sdf, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    # all vertices lie near the radius-0.3 sphere in [-.5,.5] coords
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.02)
    assert np.abs(r - 0.3).max() < 0.05


def test_point_sampling_on_surface():
    sdf = sphere_sdf(32, 0.6, trunc=1.0)
    pts = sdf_to_point_cloud(sdf, n_points=2000, level=0.0,
                             rng=np.random.RandomState(0), normalize=False)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.02)


def test_emd_sinkhorn_close_to_hungarian(rng):
    x = rng.randn(2, 24, 3).astype(np.float32)
    y = rng.randn(2, 24, 3).astype(np.float32)
    approx = np.asarray(emd_sinkhorn(jnp.asarray(x), jnp.asarray(y),
                                     epsilon=0.01, iters=200))
    exact = emd_hungarian(x, y)
    # identical clouds → ~0
    same = np.asarray(emd_sinkhorn(jnp.asarray(x), jnp.asarray(x),
                                   epsilon=0.01, iters=200))
    assert np.all(same < 0.15 * exact)
    # entropic OT upper/approximates the exact matching cost
    ratio = approx / exact
    assert np.all(ratio > 0.8) and np.all(ratio < 1.6)


def test_mmd_cov_basics():
    d = np.array([[0.1, 5.0], [4.0, 0.2]])
    res = mmd_cov(d)
    np.testing.assert_allclose(res["mmd"], (0.1 + 0.2) / 2)
    assert res["cov"] == 1.0
    d2 = np.array([[0.1, 5.0], [0.05, 6.0]])  # both samples match ref 0
    assert mmd_cov(d2)["cov"] == 0.5


def test_1nn_distinguishes_separated_sets(rng):
    x = rng.randn(20, 8)
    y = rng.randn(20, 8) + 10.0

    def dmat(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1)

    res = knn_1nn_accuracy(dmat(x, x), dmat(x, y), dmat(y, y))
    assert res["1nn_acc"] == 1.0  # trivially separable
    # identical distributions → near 0.5 (here: same samples shifted epsilon)
    y2 = x + rng.randn(*x.shape) * 1e-6
    res2 = knn_1nn_accuracy(dmat(x, x), dmat(x, y2), dmat(y2, y2))
    assert res2["1nn_acc"] <= 0.6


def test_compute_all_metrics_smoke(rng):
    sample = jnp.asarray(rng.randn(6, 64, 3).astype(np.float32))
    ref = jnp.asarray(rng.randn(5, 64, 3).astype(np.float32))
    res = compute_all_metrics(sample, ref, use_emd=True, use_pallas=False)
    for k in ("mmd_cd", "cov_cd", "1nn_acc_cd", "mmd_emd", "cov_emd"):
        assert k in res and np.isfinite(res[k])


def test_marching_tets_consistent_outward_winding():
    """Every emitted face must wind CCW seen from outside (glTF/OBJ viewers
    backface-cull; signed-volume consumers need it): sphere SDF → all
    normals outward and signed volume ≈ 4/3·pi·r³."""
    R = 32
    g = np.linspace(-0.5, 0.5, R)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.3
    v, f = marching_tetrahedra(sdf, level=0.0)
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = np.einsum("fi,fi->f", n, tri.mean(1))
    assert (outward > 0).all(), \
        f"{(outward <= 0).sum()} of {len(f)} faces wind inward"
    vol = np.einsum("fi,fi->f", np.cross(tri[:, 0], tri[:, 1]),
                    tri[:, 2]).sum() / 6.0
    true = 4.0 / 3.0 * np.pi * 0.3 ** 3
    np.testing.assert_allclose(vol, true, rtol=0.02)
