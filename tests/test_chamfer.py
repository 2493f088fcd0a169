"""Chamfer/NN-distance correctness (XLA path on CPU; the Pallas path shares
the same public API and is exercised on TPU by bench/eval)."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.ops.chamfer import (chamfer, chamfer_distance,
                                          nn_distance, nn_distance_xla,
                                          pairwise_chamfer_matrix)


def brute(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(-1)


def test_nn_distance_matches_bruteforce(rng):
    x = rng.randn(2, 64, 3).astype(np.float32)
    y = rng.randn(2, 96, 3).astype(np.float32)
    got = np.asarray(nn_distance(jnp.asarray(x), jnp.asarray(y),
                                 use_pallas=False))
    np.testing.assert_allclose(got, brute(x, y), rtol=1e-4, atol=1e-5)


def test_chamfer_symmetric_zero(rng):
    x = rng.randn(1, 32, 3).astype(np.float32)
    d1, d2 = chamfer(jnp.asarray(x), jnp.asarray(x), use_pallas=False)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)


def test_gradients_match_finite_difference(rng):
    x = rng.randn(1, 8, 3).astype(np.float64).astype(np.float32)
    y = rng.randn(1, 12, 3).astype(np.float32)

    def f(x_):
        return jnp.sum(nn_distance(x_, jnp.asarray(y), False))

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    eps = 1e-3
    for (b, i, k) in [(0, 0, 0), (0, 3, 1), (0, 7, 2)]:
        xp = x.copy(); xp[b, i, k] += eps
        xm = x.copy(); xm[b, i, k] -= eps
        fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(g[b, i, k], fd, rtol=2e-2, atol=2e-3)


def test_grad_wrt_targets(rng):
    """Gradient w.r.t. y scatters −2(x−y*) onto nearest rows."""
    x = np.array([[[0.0, 0, 0], [1, 1, 1]]], np.float32)
    y = np.array([[[0.1, 0, 0], [5, 5, 5]]], np.float32)

    def f(y_):
        return jnp.sum(nn_distance(jnp.asarray(x), y_, False))

    g = np.asarray(jax.grad(f)(jnp.asarray(y)))
    # both x points are nearest to y[0]
    expect0 = -2 * ((x[0, 0] - y[0, 0]) + (x[0, 1] - y[0, 0]))
    np.testing.assert_allclose(g[0, 0], expect0, rtol=1e-4)
    np.testing.assert_allclose(g[0, 1], 0.0, atol=1e-6)


def test_pairwise_matrix(rng):
    a = rng.randn(3, 16, 3).astype(np.float32)
    b = rng.randn(4, 16, 3).astype(np.float32)
    m = np.asarray(pairwise_chamfer_matrix(jnp.asarray(a), jnp.asarray(b),
                                           use_pallas=False))
    assert m.shape == (3, 4)
    expect01 = float(chamfer_distance(jnp.asarray(a[0:1]), jnp.asarray(b[1:2]),
                                      use_pallas=False)[0])
    np.testing.assert_allclose(m[0, 1], expect01, rtol=1e-5)
