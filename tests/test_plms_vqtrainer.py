"""PLMS sampler + standalone VQ-VAE/SDFusion trainer tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import DiffusionConfig, UNetConfig, VQVAEConfig
from commonscenes_tpu.diffusion.plms import plms_sample
from commonscenes_tpu.diffusion.schedule import make_ddim_tables, make_noise_schedule
from commonscenes_tpu.train.vqvae_trainer import SDFusionTrainer, VQVAETrainer

SCHED = make_noise_schedule(100, "linear", 0.00085, 0.012)
TINY_VQ = VQVAEConfig(embed_dim=2, n_embed=16, z_channels=2, resolution=8,
                      ch=4, ch_mult=(1, 2), num_res_blocks=1)


def test_plms_zero_eps_telescopes():
    tables = make_ddim_tables(SCHED, 8, eta=0.0)

    def denoise(x, t, c):
        return jnp.zeros_like(x)

    x_T = jnp.ones((2, 4, 4, 4, 2))
    out = plms_sample(denoise, tables, x_T, cond=None, uncond=None)
    expect = np.sqrt(tables.alphas_prev[0] / tables.alphas[-1])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)


def test_plms_runs_with_cfg():
    tables = make_ddim_tables(SCHED, 5, eta=0.0)

    def denoise(x, t, c):
        return 0.05 * x + 0.01 * c.reshape(c.shape[0], 1, 1, 1, 1)

    B = 2
    x_T = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 2, 2, 1))
    out = plms_sample(denoise, tables, x_T, jnp.ones((B,)), jnp.zeros((B,)),
                      uc_scale=3.0)
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_vqvae_trainer_reduces_loss():
    trainer = VQVAETrainer(TINY_VQ, lr=3e-3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 1)) * 0.1
    state = trainer.init_state(jax.random.PRNGKey(1), x)
    _, m0 = trainer.train_step(state, x)
    s = state
    for _ in range(10):
        s, m = trainer.train_step(s, x)
    assert float(m["loss_total"]) < float(m0["loss_total"])
    assert np.isfinite(float(m["loss_codebook"]))


def test_sdfusion_trainer_step():
    unet = UNetConfig(image_size=4, in_channels=2, out_channels=2,
                      model_channels=32, num_res_blocks=1,
                      attention_resolutions=(), channel_mult=(1,),
                      num_heads=4, context_dim=8, use_checkpoint=False)
    diff = DiffusionConfig(timesteps=50)
    vq_trainer = VQVAETrainer(TINY_VQ)
    x = jnp.zeros((2, 8, 8, 8, 1))
    vq_state = vq_trainer.init_state(jax.random.PRNGKey(0), x)

    trainer = SDFusionTrainer(TINY_VQ, unet, diff)
    cond = jnp.zeros((2, 1, 8))
    state = trainer.init_state(jax.random.PRNGKey(1), x, cond,
                               vq_state.params)
    s2, metrics = trainer.train_step(state, vq_state.params, x, cond,
                                     jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(s2.step) == 1


def test_plms_cfg_fn_matches_naive_double_batch():
    """The optional CFG-deduped denoiser hook must be bitwise-equal to the
    naive 2B-batched call (same contract as ddim_sample's cfg_fn)."""
    tables = make_ddim_tables(SCHED, 5, eta=0.0)

    def denoise(x, t, c):
        return 0.05 * x + 0.01 * c.reshape(c.shape[0], 1, 1, 1, 1)

    def cfg_fn(x, t, c_full):
        return denoise(jnp.concatenate([x, x], 0),
                       jnp.concatenate([t, t], 0), c_full)

    B = 2
    x_T = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 2, 2, 1))
    naive = plms_sample(denoise, tables, x_T, jnp.ones((B,)),
                        jnp.zeros((B,)), uc_scale=3.0)
    deduped = plms_sample(denoise, tables, x_T, jnp.ones((B,)),
                          jnp.zeros((B,)), uc_scale=3.0, cfg_fn=cfg_fn)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(deduped))
