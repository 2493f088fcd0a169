"""Tests for the 3D VQ-VAE (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import VQVAEConfig
from commonscenes_tpu.nn.vqvae3d import VQVAE3D, VectorQuantizer

TINY = VQVAEConfig(embed_dim=3, n_embed=32, z_channels=3, resolution=16,
                   in_channels=1, out_ch=1, ch=8, ch_mult=(1, 2),
                   num_res_blocks=1)


def test_config_geometry():
    cfg = VQVAEConfig()  # reference operating point
    assert cfg.num_down == 2
    assert cfg.z_spatial == 16
    assert cfg.z_shape == (16, 16, 16, 3)
    assert TINY.z_spatial == 8


def test_roundtrip_shapes():
    model = VQVAE3D(TINY)
    x = jnp.zeros((2, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, emb_loss = model.apply(params, x)
    assert rec.shape == x.shape
    z = model.apply(params, x, method=VQVAE3D.encode_no_quant)
    assert z.shape == (2, 8, 8, 8, 3)
    dec = model.apply(params, z, method=VQVAE3D.decode_no_quant)
    assert dec.shape == x.shape


def test_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 2, 4))
    params = vq.init(jax.random.PRNGKey(1), z)

    def loss_fn(z_in):
        z_q, emb_loss, _ = vq.apply(params, z_in)
        return jnp.sum(z_q * 2.0)

    g = jax.grad(loss_fn)(z)
    # straight-through: dL/dz == dL/dz_q == 2 everywhere
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


def test_quantizer_picks_nearest():
    vq = VectorQuantizer(n_embed=8, embed_dim=2)
    z = jnp.zeros((1, 1, 1, 1, 2))
    params = vq.init(jax.random.PRNGKey(0), z)
    emb = np.asarray(params["params"]["embedding"]) - 1.0 / 8
    target = emb[3]
    z = jnp.asarray(target).reshape(1, 1, 1, 1, 2) + 1e-6
    z_q, _, idx = vq.apply(params, z)
    assert int(idx.reshape(-1)[0]) == 3
    np.testing.assert_allclose(np.asarray(z_q).reshape(-1), target, atol=1e-5)


def test_codebook_loss_zero_when_on_code():
    vq = VectorQuantizer(n_embed=8, embed_dim=2)
    z0 = jnp.zeros((1, 1, 1, 1, 2))
    params = vq.init(jax.random.PRNGKey(0), z0)
    emb = np.asarray(params["params"]["embedding"]) - 1.0 / 8
    z = jnp.asarray(emb[5]).reshape(1, 1, 1, 1, 2)
    _, loss, _ = vq.apply(params, z)
    assert float(loss) < 1e-10
