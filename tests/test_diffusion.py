"""Tests for q_sample / p_losses / the lax.scan DDIM sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.diffusion.ddim import ddim_sample
from commonscenes_tpu.diffusion.gaussian import p_losses, q_sample
from commonscenes_tpu.diffusion.schedule import make_ddim_tables, make_noise_schedule

SCHED = make_noise_schedule(100, "linear", 0.00085, 0.012)


def test_q_sample_broadcast():
    x = jnp.ones((2, 4, 4, 4, 3))
    noise = jnp.zeros_like(x)
    t = jnp.array([0, 99], jnp.int32)
    out = q_sample(jnp.asarray(SCHED.sqrt_alphas_cumprod),
                   jnp.asarray(SCHED.sqrt_one_minus_alphas_cumprod),
                   x, t, noise)
    np.testing.assert_allclose(out[0], SCHED.sqrt_alphas_cumprod[0], rtol=1e-6)
    np.testing.assert_allclose(out[1], SCHED.sqrt_alphas_cumprod[99], rtol=1e-6)


def test_p_losses_perfect_model_zero_loss():
    def perfect(x_noisy, t, cond):
        return noise  # predicts the exact eps

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3, 4, 4, 4, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([5, 50, 99], jnp.int32)
    losses = p_losses(perfect, SCHED, x0, None, t, noise)
    assert float(losses.total) < 1e-10
    assert float(losses.simple) < 1e-10


def test_p_losses_masked_mean():
    def model(x_noisy, t, cond):
        return jnp.zeros_like(x_noisy)

    x0 = jnp.zeros((4, 2, 2, 2, 1))
    noise = jnp.ones_like(x0) * 2.0
    t = jnp.zeros((4,), jnp.int32)
    full = p_losses(model, SCHED, x0, None, t, noise)
    # masking half the rows must not change the mean here (rows identical)
    masked = p_losses(model, SCHED, x0, None, t, noise,
                      sample_mask=jnp.array([1., 1., 0., 0.]))
    np.testing.assert_allclose(float(full.simple), float(masked.simple), rtol=1e-6)
    np.testing.assert_allclose(float(full.simple), 4.0, rtol=1e-5)


def test_ddim_zero_eps_telescopes():
    """With ε̂≡0, x_prev = sqrt(a_prev/a_t)·x, so the chain telescopes to
    x_T · sqrt(a_first / a_last)."""
    tables = make_ddim_tables(SCHED, 10, eta=0.0)

    def denoise(x, t, c):
        return jnp.zeros_like(x)

    x_T = jnp.ones((2, 4, 4, 4, 3))
    out = ddim_sample(denoise, tables, x_T, cond=None, uncond=None)
    expect = np.sqrt(tables.alphas_prev[0] / tables.alphas[-1])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)


def test_ddim_cfg_combination():
    """CFG must compute e_uc + scale·(e_c − e_uc) on a 2×-stacked call."""
    tables = make_ddim_tables(SCHED, 4, eta=0.0)
    calls = {}

    def denoise(x, t, c):
        calls["batch"] = max(calls.get("batch", 0), x.shape[0])
        # conditional half predicts c, unconditional predicts 0
        return c.reshape(c.shape[0], 1, 1, 1, 1) * jnp.ones_like(x)

    B = 3
    x_T = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 2, 2, 1))
    cond = jnp.ones((B,))
    uncond = jnp.zeros((B,))
    out_cfg = ddim_sample(denoise, tables, x_T, cond, uncond, uc_scale=3.0)
    # scale 3 on (1-0) == plain conditioning with c=3
    out_equiv = ddim_sample(denoise, tables, x_T, cond * 3.0, None)
    np.testing.assert_allclose(np.asarray(out_cfg), np.asarray(out_equiv),
                               rtol=1e-4, atol=1e-5)
    assert calls["batch"] == 2 * B


def test_ddim_eta_noise_deterministic_per_key():
    tables = make_ddim_tables(SCHED, 4, eta=1.0)

    def denoise(x, t, c):
        return 0.1 * x

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 2, 2, 1))
    a = ddim_sample(denoise, tables, x_T, None, None,
                    eta_noise_key=jax.random.PRNGKey(7))
    b = ddim_sample(denoise, tables, x_T, None, None,
                    eta_noise_key=jax.random.PRNGKey(7))
    c = ddim_sample(denoise, tables, x_T, None, None,
                    eta_noise_key=jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
