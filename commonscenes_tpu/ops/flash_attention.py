"""Fused multi-head self-attention (Pallas, TPU).

The UNet's spatial transformers attend over 1024 (16×8×8) and 256 (16×4×4)
voxel tokens (nn/attention.py). XLA's default lowering materializes the
[B, H, N, N] similarity matrix in fp32 through HBM; at N=1024, B·H=144
that's ~600 MB of traffic per attention. This kernel keeps the whole
(batch, head) attention resident in VMEM: one MXU matmul for q·kᵀ, an
on-chip fp32 softmax, and one matmul with v — no intermediate leaves the
core.

Head dims are zero-padded to a lane-friendly multiple of 64 (padding lanes
contribute zeros to q·kᵀ and are sliced off the output).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)          # [N, Dp]
    k = k_ref[0].astype(jnp.float32)          # [N, Dp]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _pick_q_tile(n_tokens: int, dp: int) -> int:
    """Largest q tile whose fp32 score block + full k/v fit in ~12MB VMEM."""
    kv_bytes = 2 * n_tokens * dp * 4
    budget = 12 * 1024 * 1024 - kv_bytes
    tq = n_tokens
    while tq > 8 and (tq * n_tokens * 4 + 2 * tq * dp * 4) > budget:
        tq //= 2
    return max(tq, 8)


def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: float | None = None) -> jax.Array:
    """q, k, v: [B, N, H, D] → [B, N, H, D]. Requires N % 8 == 0.

    Keys/values for a head stay resident in VMEM; queries are tiled when the
    fp32 score block would overflow VMEM (e.g. the VQ-VAE's 4096-token
    single-head bottleneck attention, vqvae_modules.py:126-178).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    Dp = max(_round_up(D, 64), 64)
    Tq = _pick_q_tile(N, Dp)

    def prep(x):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, N, D)
        if Dp != D:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H, N // Tq),
        in_specs=[
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, Dp), q.dtype),
    )(qp, kp, vp)

    out = out[..., :D].reshape(B, H, N, D)
    return jnp.moveaxis(out, 1, 2)


def self_attention_supported(n_tokens: int, dim_head: int) -> bool:
    """q tiles always shrink to fit; require lane-friendly shapes and k/v
    residency (full keys for one head in VMEM)."""
    dp = max(_round_up(dim_head, 64), 64)
    kv_bytes = 2 * n_tokens * dp * 4
    return n_tokens % 8 == 0 and kv_bytes < 10 * 1024 * 1024


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
