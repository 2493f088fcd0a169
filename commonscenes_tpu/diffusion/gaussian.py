"""Latent-diffusion training objective (eps-parameterization).

Capability parity with the reference's SDFusion engine forward/p_losses
(model/sdfusion_txt2shape_model.py:268-365): q_sample with precomputed
sqrt-alpha tables, L2 eps loss ("loss_simple"), VLB-weighted term, and the
total = l_simple_weight * simple + original_elbo_weight * vlb.

Pure functions over explicit rng keys — the reference's implicit torch
global RNG becomes a jax.random key threaded by the train step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from commonscenes_tpu.diffusion.schedule import NoiseSchedule


class DiffusionLosses(NamedTuple):
    total: jax.Array
    simple: jax.Array
    vlb: jax.Array


def q_sample(sched_sqrt_ac: jax.Array, sched_sqrt_1mac: jax.Array,
             x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε  (broadcast per-sample t)."""
    shape = (x_start.shape[0],) + (1,) * (x_start.ndim - 1)
    a = jnp.take(sched_sqrt_ac, t).reshape(shape)
    b = jnp.take(sched_sqrt_1mac, t).reshape(shape)
    return a * x_start + b * noise


def p_losses(denoise_fn: Callable, sched: NoiseSchedule, x_start: jax.Array,
             cond: jax.Array, t: jax.Array, noise: jax.Array,
             sample_mask: jax.Array | None = None,
             l_simple_weight: float = 1.0,
             original_elbo_weight: float = 0.0) -> DiffusionLosses:
    """eps-objective losses.

    denoise_fn(x_noisy, t, cond) → ε̂. ``sample_mask`` [B] masks padded
    shape-batch rows out of the mean (the reference has no padding and
    averages over all rows, sdfusion_txt2shape_model.py:328-343).
    """
    sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod)
    sqrt_1mac = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    lvlb_w = jnp.asarray(sched.lvlb_weights)

    x_noisy = q_sample(sqrt_ac, sqrt_1mac, x_start, t, noise)
    model_out = denoise_fn(x_noisy, t, cond)
    target = noise

    sq = jnp.square(model_out.astype(jnp.float32) - target.astype(jnp.float32))
    per_sample = jnp.mean(sq, axis=tuple(range(1, sq.ndim)))  # [B]

    if sample_mask is None:
        mean = lambda v: jnp.mean(v)
    else:
        m = sample_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        mean = lambda v: jnp.sum(v * m) / denom

    loss_simple = mean(per_sample)
    loss_vlb = mean(jnp.take(lvlb_w, t) * per_sample)
    total = l_simple_weight * loss_simple + original_elbo_weight * loss_vlb
    return DiffusionLosses(total=total, simple=loss_simple, vlb=loss_vlb)


def sample_timesteps(key: jax.Array, batch: int, num_timesteps: int) -> jax.Array:
    return jax.random.randint(key, (batch,), 0, num_timesteps, dtype=jnp.int32)
