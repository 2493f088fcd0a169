"""Host-driven DDIM step loop == compiled scan chain.

The eval CLI's --host_denoise mode drives the DDIM chain one jitted step
at a time (models/commonscenes.py denoise_prep/denoise_step) because the
chain-as-one-program compile exceeds the tunneled TPU's stable window.
These tests pin that the step loop is numerically identical to the
compiled `lax.scan` chain (diffusion/ddim.py ddim_sample), which itself
carries chain parity against the reference sampler
(samplers/ddim.py:125-179, tests/test_torch_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.diffusion.ddim import ddim_sample, ddim_step
from commonscenes_tpu.diffusion.schedule import (make_ddim_tables,
                                                 make_noise_schedule)
from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
from tests.test_train_step import VOCAB, make_batch, tiny_cfg

pytestmark = pytest.mark.fast


def _toy_denoiser():
    w = jax.random.normal(jax.random.PRNGKey(7), (8, 8)) * 0.3

    def denoise_fn(x, t, c):
        h = x @ w + c[:, None, :8]
        return jnp.tanh(h) + 0.01 * t.astype(jnp.float32)[:, None, None]
    return denoise_fn


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_step_loop_matches_scan(eta):
    tables = make_ddim_tables(make_noise_schedule(timesteps=40), 6, eta=eta)
    B, N, D = 3, 5, 8
    x_T = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 16))
    uncond = jnp.zeros_like(cond)
    fn = _toy_denoiser()
    key = jax.random.PRNGKey(42)

    ref = ddim_sample(fn, tables, x_T, cond, uncond, uc_scale=3.0,
                      eta_noise_key=key)

    stoch = bool(np.any(np.asarray(tables.sigmas) != 0.0))
    S = int(np.asarray(tables.timesteps).shape[0])
    x, k = x_T, key
    step = jax.jit(lambda x, k, i: ddim_step(
        fn, tables, x, k, i, cond, uncond, uc_scale=3.0,
        stochastic_eta=stoch))
    for i in range(S):
        x, k = step(x, k, np.int32(i))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_model_host_denoise_matches_gen_latents():
    """denoise_prep + S×denoise_step == gen_latents on the real v2_full
    model (tiny config), including slot packing — the exact composition
    the eval CLI's --host_denoise uses."""
    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    lay = model.sample_layout(variables, batch.dec, jnp.zeros((16,)),
                              jnp.eye(16), jax.random.PRNGKey(3))
    slots = jnp.asarray([1, 2, 5, 7], jnp.int32)
    k_noise = jax.random.PRNGKey(9)

    ref = model.gen_latents(variables, lay["uc_rel"], lay["c_rel"],
                            k_noise, shape_slot_idx=slots)

    x, cin, ucin, key = jax.jit(
        lambda uc, c, k, s: model.denoise_prep(variables, uc, c, k,
                                               shape_slot_idx=s))(
        lay["uc_rel"], lay["c_rel"], k_noise, slots)
    step = jax.jit(lambda x, k, i, cin, ucin: model.denoise_step(
        variables, x, k, i, cin, ucin))
    S = int(np.asarray(model.ddim_tables.timesteps).shape[0])
    for i in range(S):
        x, key = step(x, key, np.int32(i), cin, ucin)

    np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
