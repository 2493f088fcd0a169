"""Golden tests for schedule math against an independent torch computation
of the LDM formulas (reference ldm_diffusion_util.py:43-117,
sdfusion_txt2shape_model.py:184-237)."""

import numpy as np
import pytest

from commonscenes_tpu.diffusion.schedule import (
    make_beta_schedule, make_ddim_tables, make_ddim_timesteps,
    make_noise_schedule)

torch = pytest.importorskip("torch")


def torch_linear_betas(n, start, end):
    return (torch.linspace(start ** 0.5, end ** 0.5, n,
                           dtype=torch.float64) ** 2).numpy()


def test_linear_betas_match_torch():
    ours = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    ref = torch_linear_betas(1000, 0.00085, 0.012)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_schedule_tables():
    s = make_noise_schedule(1000, "linear", 0.00085, 0.012)
    betas = torch_linear_betas(1000, 0.00085, 0.012)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    acp = np.append(1.0, ac[:-1])
    np.testing.assert_allclose(s.alphas_cumprod, ac.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(s.sqrt_alphas_cumprod, np.sqrt(ac), rtol=1e-6)
    post_var = betas * (1 - acp) / (1 - ac)
    np.testing.assert_allclose(s.posterior_variance, post_var, rtol=1e-5)
    lvlb = betas ** 2 / (2 * post_var * alphas * (1 - ac))
    lvlb[0] = lvlb[1]
    np.testing.assert_allclose(s.lvlb_weights, lvlb.astype(np.float32), rtol=1e-5)
    assert not np.any(np.isnan(s.lvlb_weights))


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps(100, 1000)
    assert ts.shape == (100,)
    assert ts[0] == 1 and ts[-1] == 991
    np.testing.assert_array_equal(np.diff(ts), 10)


def test_ddim_tables_eta0():
    s = make_noise_schedule(1000, "linear", 0.00085, 0.012)
    t = make_ddim_tables(s, 100, eta=0.0)
    assert np.all(t.sigmas == 0.0)
    np.testing.assert_allclose(t.alphas, s.alphas_cumprod[t.timesteps], rtol=1e-6)
    assert t.alphas_prev[0] == s.alphas_cumprod[0]
    np.testing.assert_allclose(t.alphas_prev[1:],
                               s.alphas_cumprod[t.timesteps[:-1]], rtol=1e-6)


def test_ddim_tables_eta1():
    s = make_noise_schedule(1000, "linear", 0.00085, 0.012)
    t = make_ddim_tables(s, 50, eta=1.0)
    a, ap = t.alphas.astype(np.float64), t.alphas_prev.astype(np.float64)
    expect = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(t.sigmas, expect, rtol=1e-5)
