"""Training objectives for the layout branch.

Capability parity with reference model/losses.py:5-51 (stable BCE, L1 box
reconstruction, NLL angle loss, KL divergence) — reformulated as masked
means over padded node slots. The reference selects "kept" rows by python
list surgery (VAEGAN_V2FULL.py:535-551); here the same selection is a
weight vector.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(jnp.float32)
    while m.ndim < x.ndim:
        m = m[..., None]
    denom = jnp.maximum(jnp.sum(m) * (x.size / m.size), 1.0)
    return jnp.sum(x * m) / denom


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Numerically stable elementwise BCE (reference model/losses.py:5-23).

    NOTE: unlike the reference (which applies BCE to *sigmoid outputs*, a
    Graph-to-3D quirk), we keep the discriminator heads as logits and apply
    the stable form directly — same objective, better conditioning.
    """
    neg_abs = -jnp.abs(logits)
    return jnp.clip(logits, 0, None) - logits * target + jnp.log1p(jnp.exp(neg_abs))


def box_reconstruction_loss(pred: jax.Array, target: jax.Array,
                            mask: jax.Array) -> jax.Array:
    """Masked L1 over box params (reference F.l1_loss, losses.py:30)."""
    return masked_mean(jnp.abs(pred - target), mask)


def angle_nll_loss(log_probs: jax.Array, target_bins: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Masked NLL over angle bins (reference F.nll_loss, losses.py:33)."""
    picked = jnp.take_along_axis(log_probs, target_bins[:, None], axis=1)[:, 0]
    return -masked_mean(picked, mask)


def kl_divergence(mu: jax.Array, logvar: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """-0.5·Σ(1+logvar-mu²-e^logvar)/num_nodes (reference losses.py:37).

    The reference divides the full sum by the node count; with padding we
    sum only valid rows and divide by the valid count.
    """
    per_row = -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar),
                             axis=1)
    m = mask.astype(jnp.float32)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def layout_vae_losses(box_pred: jax.Array, box_gt: jax.Array,
                      angle_logprobs: Optional[jax.Array],
                      angle_gt: Optional[jax.Array], mu: jax.Array,
                      logvar: jax.Array, keep_mask: jax.Array,
                      enc_mask: jax.Array, kl_weight: float = 0.1
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference calculate_model_losses (losses.py:26-51) applied to the
    kept (untouched) decoder nodes."""
    rec = box_reconstruction_loss(box_pred, box_gt, keep_mask)
    losses = {"box_rec": rec}
    total = rec
    if angle_logprobs is not None:
        ang = angle_nll_loss(angle_logprobs, angle_gt, keep_mask)
        losses["angle_nll"] = ang
        total = total + ang
    kld = kl_divergence(mu, logvar, enc_mask)
    losses["kld"] = kld
    total = total + kl_weight * kld
    losses["total"] = total
    return total, losses
