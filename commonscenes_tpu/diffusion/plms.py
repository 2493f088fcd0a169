"""PLMS (pseudo linear multistep) sampler as a lax.scan.

Capability parity with the reference PLMSSampler
(model/networks/diffusion_networks/samplers/plms.py:14-247): 4th-order
Adams-Bashforth eps extrapolation over the DDIM grid with the RK2-style
warm-start for the first step, classifier-free guidance via a 2×-stacked
denoiser call. (The reference keeps PLMS unwired from the eval path; we
expose it as an alternative to `ddim_sample` with the same signature.)

The multistep eps history lives in a fixed [4, ...] scan carry ring buffer —
no dynamic python lists, one compiled program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from commonscenes_tpu.diffusion.schedule import DDIMTables


def plms_sample(denoise_fn: Callable, tables: DDIMTables, x_T: jax.Array,
                cond: jax.Array, uncond: Optional[jax.Array] = None,
                uc_scale: float = 1.0,
                cfg_fn: Optional[Callable] = None) -> jax.Array:
    """``cfg_fn(x, t, cond_full) → ε̂ [2B, ...]`` is the optional CFG-deduped
    denoiser (same contract as ddim_sample: x/t at batch B, cond_full =
    [uncond ‖ cond]; the UNet shares the context-free prefix between the
    halves, nn/unet3d.py cfg_pair) — bitwise-equal to the naive 2B call."""
    steps = jnp.asarray(tables.timesteps)
    alphas = jnp.asarray(tables.alphas)
    alphas_prev = jnp.asarray(tables.alphas_prev)
    sqrt_1m = jnp.asarray(tables.sqrt_one_minus_alphas)
    S = steps.shape[0]
    B = x_T.shape[0]

    use_cfg = uncond is not None and uc_scale != 1.0
    if use_cfg:
        cond_full = jnp.concatenate([uncond, cond], axis=0)

    def eps_fn(x, t_scalar):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        if use_cfg:
            if cfg_fn is not None:
                e_both = cfg_fn(x, t, cond_full)
            else:
                e_both = denoise_fn(jnp.concatenate([x, x], 0),
                                    jnp.concatenate([t, t], 0), cond_full)
            e_uc, e_c = jnp.split(e_both, 2, axis=0)
            return e_uc + uc_scale * (e_c - e_uc)
        return denoise_fn(x, t, cond)

    bshape = (1,) * x_T.ndim

    def x_prev_from_eps(x, e_t, i):
        a_t = alphas[i].reshape(bshape)
        a_prev = alphas_prev[i].reshape(bshape)
        sq1m = sqrt_1m[i].reshape(bshape)
        pred_x0 = (x - sq1m * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def body(carry, idx):
        x, hist, count = carry
        i = S - 1 - idx
        t_cur = steps[i]
        t_next = jnp.where(i > 0, steps[jnp.maximum(i - 1, 0)], steps[0])

        e_t = eps_fn(x, t_cur)

        # multistep coefficients by history depth (plms.py:214-227)
        e1 = hist[0]
        e2 = hist[1]
        e3 = hist[2]
        prime_1 = e_t                                       # count == 0 (RK warmup below)
        prime_2 = (3 * e_t - e1) / 2
        prime_3 = (23 * e_t - 16 * e1 + 5 * e2) / 12
        prime_4 = (55 * e_t - 59 * e1 + 37 * e2 - 9 * e3) / 24
        e_prime_ms = jnp.where(
            count >= 3, prime_4,
            jnp.where(count == 2, prime_3,
                      jnp.where(count == 1, prime_2, prime_1)))

        # first step: RK2 warm start — evaluate eps at x_prev, t_next
        def rk2():
            x_prev_e = x_prev_from_eps(x, e_t, i)
            e_next = eps_fn(x_prev_e, t_next)
            return (e_t + e_next) / 2

        e_prime = jax.lax.cond(count == 0, rk2, lambda: e_prime_ms)
        x_prev = x_prev_from_eps(x, e_prime, i)

        new_hist = jnp.stack([e_t, hist[0], hist[1], hist[2]])
        return (x_prev, new_hist, count + 1), None

    hist0 = jnp.zeros((4,) + x_T.shape, x_T.dtype)
    (x_final, _, _), _ = jax.lax.scan(
        body, (x_T, hist0, jnp.zeros((), jnp.int32)), jnp.arange(S))
    return x_final
