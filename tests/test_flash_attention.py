"""Flash-attention kernel tests.

The Pallas kernel only runs on TPU; on the CPU test mesh we verify the
dispatch predicates and that the attention module's fallback path is used.
TPU-side numerical checks (fwd + VJP vs XLA) run when a TPU is present
(e.g. invoked manually outside the conftest-forced CPU platform).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.ops import flash_attention as fa


def test_support_predicate():
    assert fa.self_attention_supported(1024, 56)      # UNet ds=2
    assert fa.self_attention_supported(256, 84)       # UNet ds=4
    assert fa.self_attention_supported(4096, 256)     # VQ-VAE bottleneck
    assert not fa.self_attention_supported(1001, 56)  # not sublane-aligned
    assert not fa.self_attention_supported(65536, 256)  # k/v exceed VMEM


def test_q_tile_selection():
    assert fa._pick_q_tile(1024, 64) == 1024          # whole head fits
    tq = fa._pick_q_tile(4096, 256)
    assert tq < 4096 and 4096 % tq == 0               # tiled
    assert fa._pick_q_tile(4096, 256, extra_factor=3) <= tq


def test_cpu_fallback_path():
    """On the CPU mesh the attention module must not invoke the kernel."""
    assert not fa.on_tpu()
    from commonscenes_tpu.nn.attention import MultiHeadAttention
    m = MultiHeadAttention(heads=2, dim_head=8)
    x = jnp.zeros((1, 16, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)   # would raise on CPU if the kernel were taken
    assert out.shape == (1, 16, 16)


@pytest.mark.skipif(not fa.on_tpu(), reason="needs a TPU")
def test_kernel_matches_xla_on_tpu():
    B, N, H, D = 2, 256, 4, 56
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = [jax.random.normal(kk, (B, N, H, D)) for kk in ks]
    out = fa.flash_self_attention(q, k, v)
    scale = D ** -0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(sim, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.fast
def test_single_token_cross_attention_shortcut_exact():
    """Cross-attention to M=1 context: the broadcast shortcut must equal
    the full softmax path bit-for-bit in math (softmax over one key ≡ 1),
    including zero gradients for to_q/to_k."""
    import jax
    import jax.numpy as jnp
    from commonscenes_tpu.nn.attention import MultiHeadAttention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    ctx1 = jnp.asarray(rng.randn(2, 1, 24).astype(np.float32))
    mha = MultiHeadAttention(heads=4, dim_head=8)
    p = mha.init(jax.random.PRNGKey(0), x, ctx1)

    out = mha.apply(p, x, ctx1)

    # reference: the generic formula evaluated manually
    wq = p["params"]["to_q"]["kernel"]
    wv = p["params"]["to_v"]["kernel"]
    wo = p["params"]["to_out"]["kernel"]
    bo = p["params"]["to_out"]["bias"]
    v = ctx1[:, 0] @ wv
    ref = (v @ wo + bo)[:, None, :] * jnp.ones((1, 16, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # gradients: d out / d wq must be exactly zero (softmax' of a single
    # logit is 0); d/d wv nonzero
    def loss(params):
        return jnp.sum(mha.apply(params, x, ctx1) ** 2)

    g = jax.grad(loss)(p)
    assert float(jnp.max(jnp.abs(g["params"]["to_q"]["kernel"]))) == 0.0
    assert float(jnp.max(jnp.abs(g["params"]["to_v"]["kernel"]))) > 0.0
