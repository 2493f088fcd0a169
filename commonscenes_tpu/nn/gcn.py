"""Triplet-GCN message passing, TPU-native.

Capability parity with the reference's ``GraphTripleConv[Net]``
(model/graph.py:89-288): per-triple MLP over (subject, predicate, object)
vectors, pooled back to nodes, with 'sum' | 'avg' | 'wAvg' pooling and
optional residual projections.

TPU redesign: the torch ``scatter_add`` over a ragged graph becomes
``jax.ops.segment_sum`` over a static flattened [B*N] node axis with
padded-triple masking — one fused gather/matmul/scatter program under jit,
no dynamic shapes, no recompiles across batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from commonscenes_tpu.nn.mlp import MLP, he_normal


class EdgeWeightNet(nn.Module):
    """Predicts per-edge subject/object pooling weights ('wAvg' pooling;
    reference model/graph.py:37-86)."""

    feat_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, s: jax.Array, p: jax.Array, o: jax.Array):
        # one shared projection for subject AND object, like the reference
        # (graph.py:70-73 applies down_sample_obj to both s and o)
        down_obj = nn.Dense(self.feat_dim, kernel_init=he_normal,
                            dtype=self.dtype, name="down_obj")
        s = down_obj(s)
        p = nn.Dense(self.feat_dim, kernel_init=he_normal, dtype=self.dtype,
                     name="down_pred")(p)
        o = down_obj(o)
        feat = jnp.concatenate([s, o, p], axis=1)

        def head(name):
            h = nn.Dense(64, kernel_init=he_normal, dtype=self.dtype,
                         name=f"{name}_0")(feat)
            h = nn.relu(h)
            h = nn.Dense(1, kernel_init=he_normal, dtype=self.dtype,
                         name=f"{name}_1")(h)
            return nn.sigmoid(h)

        return head("net_s"), head("net_o")


class GraphTripleConv(nn.Module):
    """One scene-graph convolution layer on a flattened padded graph."""

    input_dim_obj: int
    input_dim_pred: int
    hidden_dim: int = 512
    output_dim: Optional[int] = None
    pooling: str = "avg"
    mlp_normalization: str = "none"
    residual: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, obj_vecs: jax.Array, pred_vecs: jax.Array,
                 edges: jax.Array, obj_mask: jax.Array,
                 triple_mask: jax.Array, train: bool = False):
        """obj_vecs [O, Do], pred_vecs [T, Dp], edges [T, 2] (subject, object
        node indices), obj_mask [O], triple_mask [T] → (new_obj [O, Dout],
        new_pred [T, Dout])."""
        out_dim = self.output_dim if self.output_dim is not None else self.input_dim_obj
        H = self.hidden_dim
        num_objs = obj_vecs.shape[0]

        s_idx = edges[:, 0]
        o_idx = edges[:, 1]

        cur_s = jnp.take(obj_vecs, s_idx, axis=0)
        cur_o = jnp.take(obj_vecs, o_idx, axis=0)
        t_in = jnp.concatenate([cur_s, pred_vecs, cur_o], axis=1)

        t_out = MLP((H, 2 * H + out_dim), batch_norm=self.mlp_normalization,
                    dtype=self.dtype, name="net1")(t_in, mask=triple_mask,
                                                   train=train)
        new_s = t_out[:, :H]
        new_p = t_out[:, H:H + out_dim]
        new_o = t_out[:, H + out_dim:]

        w = triple_mask.astype(t_out.dtype)[:, None]
        if self.pooling == "wAvg":
            w_s, w_o = EdgeWeightNet(dtype=self.dtype, name="weight_net")(
                jax.lax.stop_gradient(new_s),
                jax.lax.stop_gradient(new_p),
                jax.lax.stop_gradient(new_o))
            new_s = w_s * new_s
            new_o = w_o * new_o

        pooled = jax.ops.segment_sum(new_s * w, s_idx, num_segments=num_objs)
        pooled = pooled + jax.ops.segment_sum(new_o * w, o_idx, num_segments=num_objs)

        if self.pooling == "wAvg":
            wsum = jax.ops.segment_sum(w_s * w, s_idx, num_segments=num_objs)
            wsum = wsum + jax.ops.segment_sum(w_o * w, o_idx, num_segments=num_objs)
            pooled = pooled / (wsum + 1e-4)
        elif self.pooling == "avg":
            counts = jax.ops.segment_sum(w, s_idx, num_segments=num_objs)
            counts = counts + jax.ops.segment_sum(w, o_idx, num_segments=num_objs)
            pooled = pooled / jnp.maximum(counts, 1.0)

        new_obj = MLP((H, out_dim), batch_norm=self.mlp_normalization,
                      dtype=self.dtype, name="net2")(pooled, mask=obj_mask,
                                                     train=train)

        if self.residual:
            new_obj = new_obj + nn.Dense(out_dim, dtype=self.dtype,
                                         name="proj_obj")(obj_vecs)
            new_p = new_p + nn.Dense(out_dim, dtype=self.dtype,
                                     name="proj_pred")(pred_vecs)

        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """A stack of GraphTripleConv layers (reference model/graph.py:214-250).
    When ``output_dim`` is set, only the last layer maps to it."""

    input_dim_obj: int
    input_dim_pred: int
    num_layers: int = 2
    hidden_dim: int = 512
    output_dim: Optional[int] = None
    pooling: str = "avg"
    mlp_normalization: str = "none"
    residual: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, obj_mask, triple_mask,
                 train: bool = False):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out_dim = self.output_dim if (last and self.output_dim is not None) else None
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim_obj=self.input_dim_obj,
                input_dim_pred=self.input_dim_pred,
                hidden_dim=self.hidden_dim,
                output_dim=out_dim,
                pooling=self.pooling,
                mlp_normalization=self.mlp_normalization,
                residual=self.residual,
                dtype=self.dtype,
                name=f"gconv_{i}",
            )(obj_vecs, pred_vecs, edges, obj_mask, triple_mask, train=train)
        return obj_vecs, pred_vecs
