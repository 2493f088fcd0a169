"""Chamfer / nearest-neighbor point-set distances — Pallas TPU kernels.

Replaces the reference's two CUDA extensions:
* extension/chamfer.cu (NmDistanceKernel, tiled shared-memory NN search) +
  extension/dist_chamfer.py (autograd wrapper) — used by the diversity
  metric (scripts/eval_3dfront.py:395-397,692-694);
* scripts/pytorch_structural_losses/src/nndistance.cu — used by the
  MMD/COV/1-NN suite (scripts/compute_mmd_cov_1nn.py:25-66).

TPU design: the pairwise-distance matrix tile  d(i,j) = ‖x_i‖² + ‖y_j‖²
− 2·x_i·y_j  is one MXU matmul per (TM, TN) block; a running min over the
N-tile grid axis accumulates nearest distances in VMEM. Points are padded
to lane multiples with +inf-masked tails. The backward pass recomputes the
argmin tile-wise (cheaper than storing [B, N] indices in HBM) via a custom
VJP, matching the CUDA grad kernel's semantics d∂(min_j ‖x_i−y_j‖²)/∂x_i =
2(x_i − y_argmin).

A pure-jnp fallback (`chamfer_xla`) covers CPU tests and any shape the
kernel doesn't like; `chamfer` picks automatically.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp



def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_points(x: jax.Array, n_to: int) -> jax.Array:
    """Pad [B, N, 3] to [B, n_to, 3]; padded rows go far away (1e9) so they
    never win a min as targets (they are masked out as queries)."""
    B, N, D = x.shape
    if N == n_to:
        return x
    pad = jnp.full((B, n_to - N, D), 1e9, x.dtype)
    return jnp.concatenate([x, pad], axis=1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _nn_kernel_body(x_ref, y_ref, out_ref):
    """Tile layout: features on sublanes, points on lanes.

    x_ref [8, TM], y_ref [8, TN], out_ref [8, TM] (row 0 carries the result;
    the other sublanes are written for tile-shape compliance)."""
    import jax.experimental.pallas as pl
    x = x_ref[:].astype(jnp.float32)                     # [8, TM]
    y = y_ref[:].astype(jnp.float32)                     # [8, TN]
    x2 = jnp.sum(x * x, axis=0)[:, None]                 # [TM, 1]
    y2 = jnp.sum(y * y, axis=0)[None, :]                 # [1, TN]
    xy = jnp.dot(x.T, y, preferred_element_type=jnp.float32)  # MXU [TM, TN]
    d = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    tile_min = jnp.min(d, axis=1)                        # [TM]
    tile_min8 = jnp.broadcast_to(tile_min[None, :], out_ref.shape)
    jtile = pl.program_id(2)

    @pl.when(jtile == 0)
    def _init():
        out_ref[:] = tile_min8

    @pl.when(jtile != 0)
    def _acc():
        out_ref[:] = jnp.minimum(out_ref[:], tile_min8)


def nn_distance_pallas(x: jax.Array, y: jax.Array, tm: int = 512,
                       tn: int = 1024) -> jax.Array:
    """min_j ‖x_i − y_j‖² per query point. x [B,N,3], y [B,M,3] → [B,N]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = x.shape
    M = y.shape[1]
    Np, Mp = _round_up(N, tm), _round_up(M, tn)
    # features-on-sublanes layout: [8, B*Np]
    xT = jnp.swapaxes(
        jnp.concatenate([_pad_points(x, Np),
                         jnp.zeros((B, Np, 5), x.dtype)], axis=2),
        1, 2).reshape(B * 8, Np).reshape(B, 8, Np)
    yT = jnp.swapaxes(
        jnp.concatenate([_pad_points(y, Mp),
                         jnp.zeros((B, Mp, 5), y.dtype)], axis=2),
        1, 2).reshape(B, 8, Mp)
    xT = jnp.concatenate([xT[b] for b in range(B)], axis=1) if B > 1 else xT[0]
    yT = jnp.concatenate([yT[b] for b in range(B)], axis=1) if B > 1 else yT[0]
    # xT [8, B*Np], yT [8, B*Mp]

    nb_i, nb_j = Np // tm, Mp // tn
    grid = (B, nb_i, nb_j)
    out = pl.pallas_call(
        _nn_kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tm), lambda b, i, j, nb=nb_i: (0, b * nb + i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda b, i, j, nb=nb_j: (0, b * nb + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tm), lambda b, i, j, nb=nb_i: (0, b * nb + i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B * Np), jnp.float32),
    )(xT, yT)
    return out[0].reshape(B, Np)[:, :N]


# ---------------------------------------------------------------------------
# XLA fallback + differentiable public API
# ---------------------------------------------------------------------------


def _pairwise_sq(x: jax.Array, y: jax.Array) -> jax.Array:
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def nn_distance_xla(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.min(_pairwise_sq(x, y), axis=-1)


def _nn_with_idx(x: jax.Array, y: jax.Array):
    d = _pairwise_sq(x, y)
    idx = jnp.argmin(d, axis=-1)
    return jnp.min(d, axis=-1), idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def nn_distance(x: jax.Array, y: jax.Array, use_pallas: bool = True) -> jax.Array:
    """Differentiable min_j ‖x_i−y_j‖² ([B,N,3],[B,M,3] → [B,N] f32)."""
    if use_pallas and _on_tpu():
        return nn_distance_pallas(x, y)
    return nn_distance_xla(x, y)


def _nn_fwd(x, y, use_pallas):
    d = nn_distance(x, y, use_pallas)
    return d, (x, y)


def _nn_bwd(use_pallas, res, g):
    x, y = res
    # recompute argmin (CUDA grad kernel semantics: grad flows to the pair)
    _, idx = _nn_with_idx(x, y)
    y_near = jnp.take_along_axis(y, idx[..., None], axis=1)
    diff = 2.0 * (x - y_near)
    gx = g[..., None] * diff
    # scatter -grad onto selected y rows
    gy = jnp.zeros_like(y)
    gy = jax.vmap(lambda gy_b, idx_b, v_b: gy_b.at[idx_b].add(-v_b))(
        gy, idx, gx)
    return gx, gy


nn_distance.defvjp(_nn_fwd, _nn_bwd)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def chamfer(x: jax.Array, y: jax.Array,
            use_pallas: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Bidirectional squared chamfer terms (dist1 [B,N], dist2 [B,M]) —
    the `chamferDist()(xyz1, xyz2)` surface of extension/dist_chamfer.py."""
    return (nn_distance(x, y, use_pallas), nn_distance(y, x, use_pallas))


def chamfer_distance(x: jax.Array, y: jax.Array,
                     use_pallas: bool = True) -> jax.Array:
    """Scalar per-pair chamfer: mean_i d1 + mean_j d2 → [B]."""
    d1, d2 = chamfer(x, y, use_pallas)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


def pairwise_chamfer_matrix(a: jax.Array, b: jax.Array,
                            use_pallas: bool = True) -> jax.Array:
    """All-pairs chamfer between two sets of clouds: a [Na,P,3], b [Nb,P,3]
    → [Na, Nb]. Drives MMD/COV/1-NN (_pairwise_EMD_CD_,
    compute_mmd_cov_1nn.py:110-150)."""
    Na = a.shape[0]

    def row(ai):
        d = chamfer_distance(jnp.broadcast_to(ai[None], b.shape), b,
                             use_pallas)
        return d

    return jax.lax.map(row, a)
