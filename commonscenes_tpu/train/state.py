"""Train state and optimizer construction.

Capability parity with the reference's optimization setup: one AdamW(1e-4)
over GCN+diffusion params with the step-wise lambda schedule
(model/VAEGAN_V2FULL.py:620-669), a separate Adam for the box discriminator
(scripts/train_3dfront.py:231-236), per-branch grad-norm clipping at 5.0 and
NaN-gradient zeroing (train_3dfront.py:396-410).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from commonscenes_tpu.core.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig) -> Callable:
    """Step-function LR: lr * factor_i on [milestone_{i-1}, milestone_i)."""
    milestones = tuple(cfg.lr_milestones)
    factors = tuple(cfg.lr_factors)

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.zeros((), jnp.int32)
        for m in milestones:
            idx = idx + (step >= m).astype(jnp.int32)
        return cfg.lr * jnp.asarray(factors)[idx]

    return schedule


def scrub_nan_grads(grads):
    """Zero any NaN gradient entries (reference train_3dfront.py:400-410)."""
    return jax.tree.map(lambda g: jnp.where(jnp.isnan(g), 0.0, g), grads)


def clip_subtree_by_norm(grads: Dict[str, Any], max_norm: float):
    """Clip each top-level subtree ('layout', 'df', ...) to max_norm
    separately, mirroring the reference's two clip_grad_norm_ calls
    (train_3dfront.py:398-403)."""
    out = {}
    for k, sub in grads.items():
        leaves = jax.tree.leaves(sub)
        norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        out[k] = jax.tree.map(lambda g: g * scale, sub)
    return out


def make_generator_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=make_lr_schedule(cfg), weight_decay=0.01)


def make_discriminator_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.aux_lr, b1=0.9, b2=0.999)


@struct.dataclass
class TrainState:
    """All mutable training state for v2_full (or the box-only variants,
    where df/vqvae sub-trees are empty dicts)."""

    step: jax.Array
    gen_params: Any          # {'layout': ..., 'df': ...}
    gen_stats: Any           # {'layout': batch_stats}
    vqvae_params: Any        # frozen
    disc_params: Any
    disc_stats: Any
    gen_opt: Any
    disc_opt: Any
