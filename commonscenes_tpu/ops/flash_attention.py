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
    # matmul INPUTS stay bf16 (the v5e MXU runs bf16 at 4× its fp32 rate);
    # accumulation and the softmax are fp32
    q = q_ref[0]                              # [N, Dp]
    k = k_ref[0]                              # [N, Dp]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


_VMEM_BUDGET = 13 * 1024 * 1024   # Mosaic scoped-vmem limit is 16M; leave
                                  # headroom for compiler temporaries


def _vmem_usage(n_tokens: int, dp: int, tq: int, bwd: bool) -> int:
    """Conservative scoped-VMEM model for one grid step of the kernels.

    Counts (a) the live fp32 score-shaped [Tq, N] intermediates — the fwd
    kernel holds s and p simultaneously, the bwd kernel s/e/p/dp/ds (≈4
    after reuse); (b) the N-resident k/v (+ dk/dv accumulators in bwd)
    blocks, SINGLE-buffered (their index maps are grid-invariant, so the
    pipeline fetches them once — confirmed by the r04 numbers: the crash
    geometry's reported 17.69M matches 2 fp32 score buffers (16.8M) +
    single-buffered k/v, and N=4096/Dp=256 fwd ran fine on TPU, which
    double-buffered fp32 k/v (16.8M) alone would forbid); (c) the [Tq, Dp]
    tile-IO blocks, doubled for pipeline double-buffering. The r04 A/B
    cell ss_off_eval_b2_chunk4 crashed at compile time (17.69M > 16M
    scoped vmem, up_attn_4 geometry) because the old picker counted only
    ONE score buffer."""
    n_score = 4 if bwd else 2
    n_seq = 4 if bwd else 2           # k,v (+ dk,dv)
    n_tile = 3 if bwd else 2          # q,o / q,do,dq
    return (n_score * tq * n_tokens * 4
            + n_seq * n_tokens * dp * 4
            + 2 * n_tile * tq * dp * 4)


def _pick_q_tile(n_tokens: int, dp: int, bwd: bool = False) -> int:
    """Largest q tile whose working set fits the scoped-VMEM budget."""
    tq = n_tokens
    while tq > 8 and _vmem_usage(n_tokens, dp, tq, bwd) > _VMEM_BUDGET:
        tq //= 2
    return max(tq, 8)


def _bwd_kernel_fits(n_tokens: int, dp: int) -> bool:
    """Whether ANY q tile lets the bwd kernel fit scoped VMEM (the k/v +
    dk/dv residency is tile-independent, so large N·Dp can't fit at all)."""
    return _vmem_usage(n_tokens, dp, 8, bwd=True) <= _VMEM_BUDGET


def _xla_bwd(q, k, v, g, scale):
    """Plain-XLA attention VJP for [BH, N, Dp] buffers — the fallback when
    the bwd Pallas kernel cannot fit scoped VMEM at this geometry (e.g.
    VQ-VAE attention at N=4096 with wide single heads). Materializes the
    [BH, N, N] score matrix through HBM: slower, never a compile crash."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bnd,bmd->bnm", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bnm,bnd->bmd", p, gf)
    dp_ = jnp.einsum("bnd,bmd->bnm", gf, vf)
    ds = p * (dp_ - jnp.sum(dp_ * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmd->bnd", ds, kf) * scale
    dk = jnp.einsum("bnm,bnd->bmd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Backward for one (batch·head, q-tile): recompute p = softmax(qkᵀ),
    then dv += pᵀ·do, ds = p∘(dp − rowsum(dp∘p)), dq = ds·k,
    dk += dsᵀ·q. dk/dv accumulate across the sequential q-tile grid axis."""
    import jax.experimental.pallas as pl

    q = q_ref[0].astype(jnp.float32)            # [Tq, Dp]
    k = k_ref[0].astype(jnp.float32)            # [N, Dp]
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)          # [Tq, Dp]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)   # [Tq, N]

    dv_t = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [N, Dp]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)    # [Tq, N]
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dq_t = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk_t = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq_t.astype(dq_ref.dtype)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_t.astype(dk_ref.dtype)
        dv_ref[0] = dv_t.astype(dv_ref.dtype)

    @pl.when(j != 0)
    def _acc():
        dk_ref[0] = dk_ref[0] + dk_t.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_t.astype(dv_ref.dtype)


def _prep(x, Dp):
    B, N, H, D = x.shape
    x = jnp.moveaxis(x, 2, 1).reshape(B * H, N, D)
    if Dp != D:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D)))
    return x


def _unprep(x, B, H, N, D):
    return jnp.moveaxis(x[..., :D].reshape(B, H, N, D), 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_padded(q: jax.Array, k: jax.Array, v: jax.Array,
                           scale: float) -> jax.Array:
    """Head-major pre-padded entry: q, k, v [BH, N, Dp] (Dp a 64-multiple)
    → [BH, N, Dp]. No transposes or pad copies — callers that fold the head
    split + lane padding into their projection weights (nn/attention.py
    einsum path) hand buffers straight to the kernel."""
    return _padded_call(q, k, v, scale)


def _padded_call(q, k, v, scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH, N, Dp = q.shape
    Tq = _pick_q_tile(N, Dp)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(BH, N // Tq),
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
        out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
    )(q, k, v)


def _padded_fwd(q, k, v, scale):
    return _padded_call(q, k, v, scale), (q, k, v)


def _padded_bwd(scale, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = res
    BH, N, Dp = q.shape
    if not _bwd_kernel_fits(N, Dp):
        return _xla_bwd(q, k, v, g, scale)
    Tq = _pick_q_tile(N, Dp, bwd=True)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(BH, N // Tq),
        in_specs=[
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, Dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, N, Dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, N, Dp), jnp.float32),
        ],
    )(q, k, v, g)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


flash_attention_padded.defvjp(_padded_fwd, _padded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: float | None = None) -> jax.Array:
    """q, k, v: [B, N, H, D] → [B, N, H, D]. Requires N % 8 == 0.

    Keys/values for a head stay resident in VMEM; queries are tiled when the
    fp32 score block would overflow VMEM (e.g. the VQ-VAE's 4096-token
    single-head bottleneck attention, vqvae_modules.py:126-178).
    Differentiable: the backward pass is a second Pallas kernel that
    recomputes the softmax tile-wise (flash-style, no N×N tensor in HBM).
    """
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    Dp = max(_round_up(D, 64), 64)
    Tq = _pick_q_tile(N, Dp)

    qp, kp, vp = _prep(q, Dp), _prep(k, Dp), _prep(v, Dp)
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
    return _unprep(out, B, H, N, D)


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = res
    B, N, H, D = q.shape
    sc = D ** -0.5 if scale is None else scale
    Dp = max(_round_up(D, 64), 64)
    if not _bwd_kernel_fits(N, Dp):
        dq, dk, dv = _xla_bwd(_prep(q, Dp), _prep(k, Dp), _prep(v, Dp),
                              _prep(g, Dp), sc)
        return (_unprep(dq, B, H, N, D).astype(q.dtype),
                _unprep(dk, B, H, N, D).astype(k.dtype),
                _unprep(dv, B, H, N, D).astype(v.dtype))
    Tq = _pick_q_tile(N, Dp, bwd=True)

    qp, kp, vp, gp = _prep(q, Dp), _prep(k, Dp), _prep(v, Dp), _prep(g, Dp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=sc),
        grid=(B * H, N // Tq),
        in_specs=[
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tq, Dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B * H, N, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B * H, N, Dp), jnp.float32),
        ],
    )(qp, kp, vp, gp)
    return (_unprep(dq, B, H, N, D).astype(q.dtype),
            _unprep(dk, B, H, N, D).astype(k.dtype),
            _unprep(dv, B, H, N, D).astype(v.dtype))


flash_self_attention.defvjp(_flash_fwd, _flash_bwd)


def self_attention_supported(n_tokens: int, dim_head: int) -> bool:
    """q tiles always shrink to fit; require lane-friendly shapes and that
    the MINIMUM tile's working set (fwd and bwd) fits the scoped-VMEM
    budget — otherwise the caller falls back to the XLA einsum path
    instead of hitting a Mosaic compile-time OOM (the r04
    ss_off_eval_b2_chunk4 failure mode)."""
    dp = max(_round_up(dim_head, 64), 64)
    if n_tokens % 8 != 0 or 2 * n_tokens * dp * 4 >= 10 * 1024 * 1024:
        return False
    tq = _pick_q_tile(n_tokens, dp)
    return _vmem_usage(n_tokens, dp, tq, bwd=False) <= _VMEM_BUDGET


def on_tpu() -> bool:
    import os
    if os.environ.get("COMMONSCENES_FLASH", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
