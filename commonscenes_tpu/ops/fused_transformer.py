"""Fused transformer sub-blocks (Pallas, TPU).

The UNet's spatial-transformer blocks (nn/attention.py, reference
attention.py:222-245) spend a large share of their time in HBM round
trips between small ops: LayerNorm → GEGLU proj → split/gelu/mul →
out proj → residual leaves five full activation passes in XLA, and the
per-head attention core + output projection + residual add another four.
These kernels keep the whole chain VMEM-resident:

* ``ffn_fused``: LN → x@W1+b1 → GEGLU → @W2+b2 → +residual for a row
  block of tokens. The [rows, 3584] GEGLU intermediate never exists in
  HBM (235 MB of traffic per 8²-stage block in the XLA lowering).
* ``attn_out_fused``: per batch sample, loops heads over the softmax
  core and accumulates the output PROJECTION in VMEM fp32, adding the
  residual before the single output write.

Both are exact (fp32 statistics/softmax, erf GELU) and differentiable —
backward runs the XLA reference composition via jax.vjp, keeping
training semantics identical while the forward rides the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# LN + GEGLU feed-forward + residual
# ---------------------------------------------------------------------------


def _erf(x):
    """erf for Mosaic (no native lowering): Abramowitz & Stegun 7.1.26,
    |err| < 1.5e-7 in fp32 — far below the bf16 output resolution."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ffn_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float):
    x = x_ref[:]                                   # [T, C] bf16
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * lns_ref[:] + lnb_ref[:]).astype(x.dtype)

    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    F = w2_ref.shape[0]
    a, g = h[:, :F], h[:, F:]
    # erf GELU (torch F.gelu; reference GEGLU attention.py:39-46)
    y = (a * 0.5 * g * (1.0 + _erf(g / jnp.sqrt(2.0)))).astype(x.dtype)
    out = jnp.dot(y, w2_ref[:],
                  preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = (out + xf).astype(o_ref.dtype)


def _ffn_kernel_ftiled(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, o_ref, xn_ref, acc_ref, *, eps: float,
                       nf: int):
    """F-tiled variant: grid (rows, f-tiles). The GEGLU intermediate only
    ever exists as a [T, 2·Fb] tile, so the row block T can be 4× larger
    than the whole-F kernel's — bigger MXU tiles, same math. Weights arrive
    pre-regrouped per f-tile ([nf, C, 2Fb] / [nf, Fb, C], see _ffn_impl).
    The out-projection accumulates over f-tiles in fp32 VMEM scratch; the
    LN result is computed once per row block (j == 0) and cached."""
    j = pl.program_id(1)
    x = x_ref[:]                                   # [T, C] bf16

    @pl.when(j == 0)
    def _ln():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn_ref[:] = (xn * lns_ref[:] + lnb_ref[:]).astype(x.dtype)
        acc_ref[:] = x.astype(jnp.float32) + b2_ref[:]

    xn = xn_ref[:]
    h = jnp.dot(xn, w1_ref[0],
                preferred_element_type=jnp.float32) + b1_ref[0]
    Fb = w2_ref.shape[1]
    a, g = h[:, :Fb], h[:, Fb:]
    y = (a * 0.5 * g * (1.0 + _erf(g / jnp.sqrt(2.0)))).astype(x.dtype)
    acc_ref[:] = acc_ref[:] + jnp.dot(y, w2_ref[0],
                                      preferred_element_type=jnp.float32)

    @pl.when(j == nf - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ffn_ftile_shapes(C: int, F: int):
    """(row block T, f-tile width Fb, tile count nf) fitting ~11 MB VMEM."""
    budget = 11 * 1024 * 1024
    for T in (1024, 512, 256, 128):
        for Fb in (512, 448, 384, 256, 128):
            if F % Fb:
                continue
            w_bytes = (C * 2 * Fb + Fb * C) * 2 * 2   # double-buffered
            act = T * C * 2 * 2 + T * 2 * Fb * 4 + T * Fb * 2 \
                + T * C * 4 + T * C * 2               # x, h, y, acc, xn
            if act + w_bytes <= budget:
                return T, Fb, F // Fb
    return None


def _ffn_rows_block(C: int, F: int, dtype_bytes: int = 2) -> int:
    """Row block so x + h + y + out (+ weights) fit ~11 MB of VMEM."""
    budget = 11 * 1024 * 1024
    w_bytes = (C * 2 * F + F * C) * dtype_bytes
    t = 1024
    while t > 8:
        act = t * C * dtype_bytes * 2 + t * 2 * F * 4 + t * F * dtype_bytes \
            + t * C * 4
        if act + w_bytes <= budget:
            break
        t //= 2
    return t


def _ffn_impl(x2, ln_s, ln_b, w1, b1, w2, b2, eps, ftiled=True):
    import os
    M, C = x2.shape
    F = w2.shape[0]
    shapes = _ffn_ftile_shapes(C, F)
    env = os.environ.get("COMMONSCENES_FFN_KERNEL", "ftiled")
    # ``ftiled=False`` (training): the f-tiled pallas_call inside the full
    # fwd+bwd UNet program crashes the TPU compile helper (SIGKILL, 3×
    # reproduced via cli/train_3dfront; the same kernel compiles fine
    # standalone and in the sampling program). The win is forward-only
    # sampling anyway — training keeps the whole-F rows kernel.
    # env: "rows" forces the rows kernel, "ftiled_always" ignores the gate.
    use_ftiled = (env == "ftiled" and ftiled) or env == "ftiled_always"
    if shapes is not None and use_ftiled:
        T, Fb, nf = shapes
        pad = (-M) % T
        if pad:
            x2 = jnp.concatenate([x2, jnp.zeros((pad, C), x2.dtype)], axis=0)
        # regroup the GEGLU weights per f-tile: [C,2F] → [nf, C, 2Fb] with
        # each tile holding its [a | g] column pair; [F,C] → [nf, Fb, C]
        w1g = w1.reshape(C, 2, nf, Fb).transpose(2, 0, 1, 3) \
            .reshape(nf, C, 2 * Fb)
        # [nf, 1, 2Fb]: Mosaic needs the block's second-minor dim to equal
        # the array dim (1) — a flat [nf, 2Fb] block (1, 2Fb) is rejected
        b1g = b1.reshape(2, nf, Fb).transpose(1, 0, 2).reshape(nf, 1, 2 * Fb)
        w2g = w2.reshape(nf, Fb, C)
        out = pl.pallas_call(
            functools.partial(_ffn_kernel_ftiled, eps=eps, nf=nf),
            grid=((M + pad) // T, nf),
            in_specs=[
                pl.BlockSpec((T, C), lambda i, j: (i, 0)),
                pl.BlockSpec((C,), lambda i, j: (0,)),
                pl.BlockSpec((C,), lambda i, j: (0,)),
                pl.BlockSpec((1, C, 2 * Fb), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((1, 1, 2 * Fb), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((1, Fb, C), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((C,), lambda i, j: (0,)),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M + pad, C), x2.dtype),
            scratch_shapes=[pltpu.VMEM((T, C), x2.dtype),
                            pltpu.VMEM((T, C), jnp.float32)],
            interpret=_interpret(),
        )(x2, ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
          w1g, b1g.astype(jnp.float32), w2g, b2.astype(jnp.float32))
        return out[:M]
    T = _ffn_rows_block(C, F)
    pad = (-M) % T
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, C), x2.dtype)], axis=0)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=((M + pad) // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, 2 * F), lambda i: (0, 0)),
            pl.BlockSpec((2 * F,), lambda i: (0,)),
            pl.BlockSpec((F, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x2.dtype),
        interpret=_interpret(),
    )(x2, ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
      w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))
    return out[:M]


def ffn_reference(x2, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    """XLA composition used for the VJP and as the numeric oracle."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x2.dtype)
    h = (xn @ w1).astype(jnp.float32) + b1
    F = w2.shape[0]
    a, g = h[:, :F], h[:, F:]
    y = (a * jax.nn.gelu(g, approximate=False)).astype(x2.dtype)
    out = (y @ w2).astype(jnp.float32) + b2
    return (out + xf).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ffn_fused(x2, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5, ftiled=True):
    """x2 [M, C] tokens → LN → GEGLU FF → +residual, one HBM round trip.
    ``ftiled=False`` keeps the rows kernel (training; see _ffn_impl)."""
    return _ffn_impl(x2, ln_s, ln_b, w1, b1, w2, b2, eps, ftiled)


def _ffn_fwd(x2, ln_s, ln_b, w1, b1, w2, b2, eps, ftiled):
    return _ffn_impl(x2, ln_s, ln_b, w1, b1, w2, b2, eps, ftiled), \
        (x2, ln_s, ln_b, w1, b1, w2, b2)


def _ffn_bwd(eps, ftiled, res, g):
    _, vjp = jax.vjp(lambda *a: ffn_reference(*a, eps=eps), *res)
    return vjp(g)


ffn_fused.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# attention core + output projection + residual
# ---------------------------------------------------------------------------


def _attn_out_kernel(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, o_ref,
                     *, scale: float, heads: int, tq: int):
    x = x_ref[0].astype(jnp.float32)               # [N, C]
    acc = x + bo_ref[:]
    N = q_ref.shape[2]
    for h in range(heads):
        kh = k_ref[0, h]
        vh = v_ref[0, h]
        outs = []
        # q tiled so the fp32 score + prob buffers stay within scoped VMEM
        # (s and p coexist in the stack allocator: 2·N·Tq·4 bytes)
        for j in range(N // tq):
            qh = q_ref[0, h, j * tq:(j + 1) * tq]   # [Tq, Dp] bf16
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(vh.dtype)
            outs.append(jnp.dot(p, vh,
                                preferred_element_type=jnp.float32))
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        acc = acc + jnp.dot(o.astype(vh.dtype), wo_ref[h],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _q_tile(N: int) -> int:
    """Largest q tile whose fp32 score + prob buffers (which coexist in
    the kernel's stack allocator) stay within a 2 MB scoped-VMEM budget."""
    tq = N
    while tq > 128 and 2 * tq * N * 4 > 2 * 1024 * 1024:
        tq //= 2
    return tq


def _q_tile_batched(N: int, heads: int) -> int:
    """q tile for the all-heads-batched kernel: score+prob are
    [H, Tq, N] fp32 and coexist — budget 6 MB."""
    tq = N
    while tq > 64 and 2 * heads * tq * N * 4 > 6 * 1024 * 1024:
        tq //= 2
    return tq


def _attn_out_kernel_batched(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref,
                             o_ref, *, scale: float, heads: int, tq: int):
    """All heads per q-tile: one batched QK^T, one batched PV, one
    batched out-projection summed over heads — the head-loop variant's
    serial per-head chains leave the MXU/VPU unpipelined (profiled
    ~20 TF/s; see _attn_out_kernel). A single flat [Tq, H·Dp] @ [H·Dp, C]
    out-projection would be better still, but Mosaic cannot shape-cast
    the [Tq, H, Dp] PV output across the lane dimension."""
    N = q_ref.shape[2]
    k = k_ref[0]                                    # [H, N, Dp] bf16
    v = v_ref[0]
    bo = bo_ref[:]
    for j in range(N // tq):
        q = q_ref[0, :, j * tq:(j + 1) * tq]        # [H, Tq, Dp]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [H, Tq, N]
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=2, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [H, Tq, Dp]
        ow = jax.lax.dot_general(
            o.astype(v.dtype), wo_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [H, Tq, C]
        acc = x_ref[0, j * tq:(j + 1) * tq].astype(jnp.float32) + bo
        acc = acc + jnp.sum(ow, axis=0)
        o_ref[0, j * tq:(j + 1) * tq] = acc.astype(o_ref.dtype)


def _attn_out_impl(q, k, v, x, wo, bo, scale):
    import os
    B, H, N, Dp = q.shape
    C = x.shape[-1]
    if os.environ.get("COMMONSCENES_ATTN_KERNEL", "batched") == "batched":
        tq = _q_tile_batched(N, H)
        out = pl.pallas_call(
            functools.partial(_attn_out_kernel_batched, scale=scale,
                              heads=H, tq=tq),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((H, Dp, C), lambda b: (0, 0, 0)),
                pl.BlockSpec((C,), lambda b: (0,)),
            ],
            out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
            interpret=_interpret(),
        )(q, k, v, x, wo, bo.astype(jnp.float32))
        return out
    tq = _q_tile(N)
    out = pl.pallas_call(
        functools.partial(_attn_out_kernel, scale=scale, heads=H, tq=tq),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, N, Dp), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, Dp, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((C,), lambda b: (0,)),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=_interpret(),
    )(q, k, v, x, wo, bo.astype(jnp.float32))
    return out


def attn_out_reference(q, k, v, x, wo, bo, scale):
    """XLA composition for the VJP / numeric oracle."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bhnd,hdc->bnc", o.astype(v.dtype), wo,
                     preferred_element_type=jnp.float32)
    return (out + bo + x.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def attn_out_fused(q, k, v, x, wo, bo, scale):
    """q/k/v [B, H, N, Dp] (head-major, pre-padded), x [B, N, C] residual,
    wo [H, Dp, C]: softmax core + out projection + residual, one write."""
    return _attn_out_impl(q, k, v, x, wo, bo, scale)


def _ao_fwd(q, k, v, x, wo, bo, scale):
    return _attn_out_impl(q, k, v, x, wo, bo, scale), (q, k, v, x, wo, bo)


def _ao_bwd(scale, res, g):
    _, vjp = jax.vjp(lambda *a: attn_out_reference(*a, scale), *res)
    return vjp(g)


attn_out_fused.defvjp(_ao_fwd, _ao_bwd)


def attn_out_supported(B: int, H: int, N: int, Dp: int, C: int) -> bool:
    """Whole-sample residency: q/k/v + the q-tiled score/prob block +
    accumulators. Sized for the kernel variant that will actually dispatch
    (COMMONSCENES_ATTN_KERNEL): the batched kernel's score/prob are
    [H, Tq, N] fp32 — H× the head-loop kernel's — and its q tile has a
    64-row floor, so the two variants reject different shapes."""
    import os
    if os.environ.get("COMMONSCENES_ATTN_KERNEL", "batched") == "batched":
        tq = _q_tile_batched(N, H)
        score = 2 * H * tq * N * 4
    else:
        tq = _q_tile(N)
        score = 2 * tq * N * 4
    qkv = 3 * H * N * Dp * 2
    accs = 2 * N * C * 4 + N * C * 2
    w = H * Dp * C * 2
    return (N % 8 == 0 and N % tq == 0
            and qkv + score + accs + w < 13 * 1024 * 1024)