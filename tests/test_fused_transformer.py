"""Fused transformer kernels (ops/fused_transformer.py): interpret-mode
equivalence vs the XLA reference compositions + VJP parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.ops.fused_transformer import (attn_out_fused,
                                                    attn_out_reference,
                                                    ffn_fused,
                                                    ffn_reference)


@pytest.mark.fast
def test_ffn_fused_matches_reference():
    rng = np.random.RandomState(0)
    M, C = 24, 32
    F = 4 * C
    x = jnp.asarray(rng.randn(M, C).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, 2 * F).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(2 * F).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)

    out = ffn_fused(x, ln_s, ln_b, w1, b1, w2, b2)
    ref = ffn_reference(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # VJP routes through the reference composition
    g1 = jax.grad(lambda *a: jnp.sum(ffn_fused(*a) ** 2),
                  argnums=(0, 3, 5))(x, ln_s, ln_b, w1, b1, w2, b2)
    g2 = jax.grad(lambda *a: jnp.sum(ffn_reference(*a) ** 2),
                  argnums=(0, 3, 5))(x, ln_s, ln_b, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_attn_out_fused_matches_reference():
    rng = np.random.RandomState(1)
    B, H, N, Dp, C = 2, 4, 16, 64, 48
    q = jnp.asarray(rng.randn(B, H, N, Dp).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, N, Dp).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, N, Dp).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    wo = jnp.asarray(rng.randn(H, Dp, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    scale = 0.125

    out = attn_out_fused(q, k, v, x, wo, bo, scale)
    ref = attn_out_reference(q, k, v, x, wo, bo, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(attn_out_fused(*a, scale) ** 2),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, x, wo, bo)
    g2 = jax.grad(lambda *a: jnp.sum(attn_out_reference(*a, scale) ** 2),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, x, wo, bo)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_ffn_ftiled_multi_tile_accumulation():
    """Shapes that force nf > 1 f-tiles (C=64, F=768 → Fb=384, nf=2):
    the out-projection must accumulate across tiles exactly."""
    from commonscenes_tpu.ops.fused_transformer import _ffn_ftile_shapes
    C, F = 64, 768
    T, Fb, nf = _ffn_ftile_shapes(C, F)
    assert nf > 1, (T, Fb, nf)
    rng = np.random.RandomState(1)
    M = 40
    x = jnp.asarray(rng.randn(M, C).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, 2 * F).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(2 * F).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    out = ffn_fused(x, ln_s, ln_b, w1, b1, w2, b2)
    ref = ffn_reference(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
