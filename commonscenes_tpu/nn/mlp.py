"""MLP building blocks with mask-aware batch normalization.

Equivalent capability to the reference's ``build_mlp`` (model/layers.py:21-38,
Linear → BatchNorm1d → ReLU stacks), redesigned for static-shape padded
batches: BatchNorm statistics must ignore padded graph slots, so we compute
masked moments instead of torch's unmasked row mean.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal matches the reference's kaiming_normal_ Linear init
# (model/graph.py:31-34).
he_normal = nn.initializers.he_normal()


class MaskedBatchNorm(nn.Module):
    """BatchNorm over axis 0 with an optional per-row validity mask.

    Running statistics live in the ``batch_stats`` collection. ``momentum``
    follows the flax convention (new = m * old + (1-m) * batch); 0.9 matches
    torch BatchNorm1d's default 0.1 update rate.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                denom = jnp.asarray(xf.shape[0], jnp.float32)
                mean = jnp.mean(xf, axis=0)
                var = jnp.mean(jnp.square(xf - mean), axis=0)
            else:
                m = mask.astype(jnp.float32).reshape(-1, 1)
                denom = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=0) / denom
                var = jnp.sum(jnp.square(xf - mean) * m, axis=0) / denom
            if not self.is_initializing():
                # torch BatchNorm1d stores the UNBIASED variance in its
                # running stats (normalization itself uses the biased one)
                unbias = denom / jnp.maximum(denom - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1.0 - self.momentum) * var * unbias
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype if self.dtype is None else self.dtype)


class MLP(nn.Module):
    """Linear/[BatchNorm]/ReLU stack.

    ``dims`` excludes the input dim (inferred). ``final_nonlinearity=False``
    mirrors the reference's ``norelu=True`` heads (mean/var/d3_net/rel_mlp).
    """

    dims: Sequence[int]
    activation: str = "relu"
    batch_norm: str = "none"          # 'none' | 'batch'
    final_nonlinearity: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        n = len(self.dims)
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim, kernel_init=he_normal, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            final_layer = i == n - 1
            if not final_layer or self.final_nonlinearity:
                if self.batch_norm == "batch":
                    x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                        x, mask=mask, train=train)
                if self.activation == "relu":
                    x = nn.relu(x)
                elif self.activation == "leakyrelu":
                    x = nn.leaky_relu(x)
        return x
