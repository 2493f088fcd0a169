"""GAN discriminators for layout training.

Capability parity with reference model/discriminators.py: the relation-
conditioned box-pair discriminator (BoxDiscriminator, :80-146), the
class+real/fake shape auxiliary (ShapeAuxillary, :49-77) and the gradient
penalty (:149-163).

TPU redesign: heads emit logits (sigmoid is folded into the stable BCE) and
the reference's `backward(retain_graph)` input-gradient trick becomes an
explicit `jax.grad` w.r.t. the discriminator input, evaluated inside one
jitted step. Padded triples are handled with weight masks instead of row
selection.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from commonscenes_tpu.core.graph import SceneView, flatten_view
from commonscenes_tpu.nn.mlp import MaskedBatchNorm, he_normal


class MLPDiscriminator(nn.Module):
    """Linear/BN/LeakyReLU ×2 → logit head."""

    hidden: int = 512
    out_dim: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Dense(self.hidden, kernel_init=he_normal, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                x, mask=mask, train=train)
            x = nn.leaky_relu(x, 0.01)
        return nn.Dense(self.out_dim, kernel_init=he_normal, dtype=self.dtype,
                        name="head")(x)


class BoxDiscriminator(nn.Module):
    """Judges (subject class, object class, predicate, two boxes) tuples.

    ``features(...)`` builds the input rows so the train step can take
    input-gradients for the R1-style penalty.
    """

    num_obj_classes: int
    num_pred_classes: int
    box_dim: int = 6
    dtype: Optional[jnp.dtype] = None

    def features(self, view: SceneView, boxes_flat: jax.Array) -> jax.Array:
        """boxes_flat [B·N, 6] → rows [B·T, 2·C_obj + C_pred + 12]."""
        objs, _, edges, predicates, _, _ = flatten_view(view)
        s_cat = jax.nn.one_hot(jnp.take(objs, edges[:, 0]), self.num_obj_classes)
        o_cat = jax.nn.one_hot(jnp.take(objs, edges[:, 1]), self.num_obj_classes)
        p_cat = jax.nn.one_hot(predicates, self.num_pred_classes)
        s_box = jnp.take(boxes_flat, edges[:, 0], axis=0)
        o_box = jnp.take(boxes_flat, edges[:, 1], axis=0)
        return jnp.concatenate([s_cat, o_cat, p_cat, s_box, o_box], axis=1)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        return MLPDiscriminator(dtype=self.dtype, name="D")(
            x, mask=mask, train=train)


class ShapeAuxiliary(nn.Module):
    """Shape-code discriminator + classifier (v1_full path)."""

    num_classes: int
    hidden: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, shapes: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = shapes
        for i in range(2):
            x = nn.Dense(self.hidden, kernel_init=he_normal, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                x, mask=mask, train=train)
            x = nn.leaky_relu(x, 0.01)
        logits = nn.Dense(self.num_classes, kernel_init=he_normal,
                          dtype=self.dtype, name="classifier")(x)
        realfake = nn.Dense(1, kernel_init=he_normal, dtype=self.dtype,
                            name="discriminator")(x)
        return logits, realfake


def gradient_penalty(logits: jax.Array, input_grads: jax.Array,
                     is_real: bool) -> jax.Array:
    """(1−σ(y))²·‖∇ₓy‖² for real, σ(y)²·‖∇ₓy‖² for fake
    (reference discriminator_regularizer, discriminators.py:149-163; the
    reference's `logits` are post-sigmoid probabilities)."""
    probs = jax.nn.sigmoid(logits)
    gnorm2 = jnp.sum(jnp.square(input_grads), axis=1, keepdims=True)
    if is_real:
        return jnp.square(1.0 - probs) * gnorm2
    return jnp.square(probs) * gnorm2
