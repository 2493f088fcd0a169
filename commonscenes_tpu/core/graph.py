"""Static-shape scene-graph batch pytrees.

The reference flattens a ragged batch of scenes into one big graph with
python-list surgery at collate time (reference
dataset/threedfront_dataset.py:693-828) and inserts/removes nodes by tensor
concatenation inside the model (reference model/VAEGAN_V2FULL.py:480-508).
Neither survives jit. Here every scene is padded to a fixed
``(max_objs, max_triples)`` geometry and manipulation is expressed with
mask vectors, so the whole training step is one static XLA program.

Encoder and decoder graph *views* share one slot layout: for the "addition"
manipulation mode the encoder view simply masks out the added node (and its
triples); for the "relationship change" mode the views differ only in the
predicate ids / CLIP relation features of the changed triple. This replaces
the reference's index-shifted dual graphs while keeping identical semantics
(the GCN is permutation/slot equivariant given the edge list).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SceneView:
    """One padded view (encoder or decoder) of a batch of scene graphs.

    Shapes: B=scenes, N=max_objs, T=max_triples, C=clip_dim.
    Padded triple rows are (0, 0, 0) with ``triple_mask=0``; their pooled
    contributions are masked out inside the GCN.
    """

    objs: jax.Array            # i32 [B, N] coarse class ids
    objs_grained: jax.Array    # i32 [B, N] fine-grained class ids
    obj_mask: jax.Array        # f32 [B, N] 1 = real node
    triples: jax.Array         # i32 [B, T, 3] (subject slot, predicate, object slot)
    triple_mask: jax.Array     # f32 [B, T]
    boxes: jax.Array           # f32 [B, N, 6] normalized box params
    angles: jax.Array          # i32 [B, N] angle bin in [0, 24)
    text_feats: Optional[jax.Array] = None  # f32 [B, N, C] CLIP class-text feats
    rel_feats: Optional[jax.Array] = None   # f32 [B, T, C] CLIP relation-text feats

    @property
    def batch_size(self) -> int:
        return self.objs.shape[0]

    @property
    def max_objs(self) -> int:
        return self.objs.shape[1]

    @property
    def max_triples(self) -> int:
        return self.triples.shape[1]


@struct.dataclass
class ShapeBatch:
    """Class-balanced SDF subsample feeding the shape-diffusion branch.

    Selection happens host-side in the data pipeline (it is pure index
    bookkeeping; reference model/VAEGAN_V2FULL.py:398-463 does it with
    .cpu()/numpy mid-step). Only the selected SDF grids cross the
    host→device boundary — never the full [B, N, 64^3] tensor.
    """

    sdf: jax.Array        # f32 [S, R, R, R, 1] truncated SDF (NDHWC)
    scene_idx: jax.Array  # i32 [S] scene index into the batch
    slot_idx: jax.Array   # i32 [S] object slot within the scene
    mask: jax.Array       # f32 [S] 1 = real selection
    obj_class: jax.Array  # i32 [S] coarse class of the selected object


@struct.dataclass
class GraphBatch:
    """Full train/eval batch: encoder view, decoder view, manipulation masks."""

    enc: SceneView
    dec: SceneView
    node_new: jax.Array       # f32 [B, N] 1 = node added in decoder view
    node_changed: jax.Array   # f32 [B, N] 1 = endpoint of a changed relationship
    shapes: Optional[ShapeBatch] = None

    @property
    def keep_mask(self) -> jax.Array:
        """1 for untouched nodes (reference ``keep``, VAEGAN_V2FULL.py:535-551)."""
        touched = jnp.clip(self.node_new + self.node_changed, 0.0, 1.0)
        return (1.0 - touched) * self.dec.obj_mask


def flatten_view(view: SceneView):
    """Flatten a padded [B, N]/[B, T] view into one big graph on [B*N]/[B*T].

    Matching the reference collate's flattened-graph layout
    (threedfront_dataset.py:765-800) lets MLP batch-norm statistics span the
    whole batch and turns GCN pooling into a single ``segment_sum`` over
    ``B*N`` segments — static shapes, no ragged bookkeeping.

    Returns (objs [BN], obj_mask [BN], edges [BT, 2], predicates [BT],
    triple_mask [BT], obj_to_scene [BN]).
    """
    B, N = view.objs.shape
    T = view.triples.shape[1]
    offsets = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]          # [B, 1]
    s = view.triples[..., 0] + offsets                                # [B, T]
    o = view.triples[..., 2] + offsets
    edges = jnp.stack([s.reshape(-1), o.reshape(-1)], axis=1)         # [BT, 2]
    predicates = view.triples[..., 1].reshape(-1)
    obj_to_scene = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
    return (
        view.objs.reshape(B * N),
        view.obj_mask.reshape(B * N),
        edges,
        predicates,
        view.triple_mask.reshape(B * T),
        obj_to_scene,
    )


def flat_features(x: Optional[jax.Array]):
    """[B, K, D] → [B*K, D] (None passes through)."""
    if x is None:
        return None
    B, K, D = x.shape
    return x.reshape(B * K, D)
