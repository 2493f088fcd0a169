"""Fully-fused Pallas Winograd F(2,3)^3 conv: HBM sees x once and y once.

The XLA expression of Winograd (ops/winograd.py) must materialise the
transformed tensor U [64, tiles, Cin] and the product M [64, tiles, Cout]
in HBM — an 8x data blow-up read and written around the batched matmul,
which caps the win at the HBM roofline. This kernel keeps the whole
transformed domain in VMEM:

  - the input arrives as a polyphase "cell" decomposition
    [B, ncD, ncH, ncW, 8, C] (2x2x2 cells of the padded volume; built by
    one XLA transpose) — each 4^3 Winograd tile is exactly a 2^3
    neighbourhood of cells, so a +1-cell halo along D (expressed as a
    second BlockSpec view of the same array offset by one block) gives a
    block everything it needs with zero overlap in HBM;
  - the input transform B^T (x) B^T (x) B^T — entries {0, +-1}, two taps
    per axis — is 8 signed adds per transformed position, done on the VPU
    from the VMEM-resident cells;
  - the 64 tile matmuls [rows, Cin] x [Cin, Co_blk] run back-to-back on
    the MXU against a VMEM-resident transformed weight block;
  - the output transform A^T (entries {0, +-1}) accumulates each product
    into the 8 output positions in fp32 and writes [rows, 8, Co] once.

Workload: the reference res-block 3x3x3 convs
(model/networks/diffusion_networks/network_ae/openai_model_3d.py:202-315).
Numerics match ops/winograd.py's fp32-transform profile (~2.8x a direct
bf16 conv's own rounding; taps summed fp32 from bf16 cells, fp32 MXU
accumulation). Training takes the reference VJP (custom_vjp below).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# B^T rows ([[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]) as (element, sign)
# tap lists; element e of a tile along one axis lives in cell e//2, phase e%2.
_BT_TAPS = (((0, 1.0), (2, -1.0)),
            ((1, 1.0), (2, 1.0)),
            ((1, -1.0), (2, 1.0)),
            ((1, 1.0), (3, -1.0)))
# A^T rows ([[1,1,1,0],[0,1,-1,-1]]) as (u, sign) tap lists.
_AT_TAPS = (((0, 1.0), (1, 1.0), (2, 1.0)),
            ((1, 1.0), (2, -1.0), (3, -1.0)))


def _plan(B: int, D: int, H: int, W: int, Cin: int, Cout: int,
          budget: int = 14 * 1024 * 1024
          ) -> Optional[Tuple[int, int, int]]:
    """(b_blk, T_cd, Co_blk) targeting >=128 matmul rows within VMEM."""
    nD, nH, nW = D // 2, H // 2, W // 2
    best = None
    for b_blk in (1, 2, 4, 8):
        for T_cd in range(nD, 0, -1):
            if nD % T_cd:
                continue
            rows = b_blk * T_cd * nH * nW
            if rows > 1024:
                continue
            for co in (Cout, Cout // 2, Cout // 3, Cout // 4, Cout // 6,
                       Cout // 7):
                if co <= 0 or Cout % co:
                    continue
                # Mosaic lowering constraint: the LAST block dim must be a
                # lane multiple (128) or span the whole array axis — a
                # 224-wide Co block on a 448 axis is rejected at compile
                # time (measured on v5e, ABRESULTS_r04: winograd_pallas
                # rc=1), so such plans must never leave the planner
                if co != Cout and co % 128:
                    continue
                w_b = 64 * Cin * co * 2
                cells = 2 * 2 * b_blk * T_cd * (nH + 1) * (nW + 1) * 8 * Cin * 2
                y_b = 8 * rows * co * 4
                out_b = 2 * rows * 8 * co * 2
                if w_b + cells + y_b + out_b > budget:
                    continue
                # a full MXU row block (128) first, then Co width (wider
                # than 256 stops paying), then extra rows
                score = (min(rows, 128), min(co, 256), min(rows, 512))
                if best is None or score > best[0]:
                    best = (score, (b_blk, T_cd, co))
    return None if best is None else best[1]


def _plan_split(B: int, D: int, H: int, W: int, Cin: int, Cout: int):
    """(nsplit, (b_blk, T_cd, co_blk)) — wide-Cin convs (the 672-channel
    decoder blocks) fit VMEM poorly as one contraction; splitting Cin into
    nsplit kernel invocations (summed in fp32 outside) frees VMEM for a
    full row block and a wider Cout block."""
    best = None
    for nsplit in (1, 2, 3, 4):
        if Cin % nsplit or (nsplit > 1 and Cin // nsplit < 32):
            continue
        p = _plan(B, D, H, W, Cin // nsplit, Cout)
        if p is None:
            continue
        b_blk, T_cd, co = p
        rows = b_blk * T_cd * (H // 2) * (W // 2)
        # full row block first; a Cout block under 112 lanes wastes the
        # MXU harder than a split's extra cells/y traffic, so tier on
        # that, then FEWEST splits, then Co width
        score = (min(rows, 128), 1 if co >= 112 else 0, -nsplit,
                 min(co, 256))
        if best is None or score > best[0]:
            best = (score, (nsplit, p))
    return None if best is None else best[1]


def supports(x_shape, kernel_shape, strides, padding) -> bool:
    if tuple(strides) != (1, 1, 1) or kernel_shape[:3] != (3, 3, 3):
        return False
    if tuple(map(tuple, padding)) != ((1, 1), (1, 1), (1, 1)):
        return False
    B, D, H, W, Cin = x_shape
    if Cin < 32 or kernel_shape[4] < 32:    # see winograd.supports
        return False
    if any(d % 2 or d < 2 for d in (D, H, W)):
        return False
    return _plan_split(B, D, H, W, Cin, kernel_shape[4]) is not None


def _wino_kernel(ca_ref, cb_ref, w_ref, o_ref, *, b_blk: int, T_cd: int,
                 nH: int, nW: int):
    """Grid (co, b_blk-groups, D-chunks). ca/cb: [b_blk, T_cd, nH+1, nW+1,
    8, C] cell blocks (cb = ca offset one chunk along D → +T_cd halo
    cells). w: [64, C, Co_blk]. o: [b_blk, T_cd, nH*nW, 8, Co_blk]."""
    rows = nH * nW

    # cache every (sample, D-cell, phase) slab once: [nH+1, nW+1, C] bf16
    cell = {}
    for bi in range(b_blk):
        for dc in range(T_cd + 1):
            ref, idx = (ca_ref, dc) if dc < T_cd else (cb_ref, dc - T_cd)
            for s in range(8):
                cell[(bi, dc, s)] = ref[bi, idx, :, :, s, :]

    def u_rows(ud, uh, uw):
        """Transformed input for one (ud,uh,uw): [b_blk*T_cd*rows, C]."""
        parts = []
        for bi in range(b_blk):
            for td in range(T_cd):
                acc = None
                for ed, sd in _BT_TAPS[ud]:
                    for eh, sh in _BT_TAPS[uh]:
                        for ew, sw in _BT_TAPS[uw]:
                            s = ((ed % 2) * 2 + (eh % 2)) * 2 + (ew % 2)
                            slab = cell[(bi, td + ed // 2, s)]
                            v = slab[eh // 2:eh // 2 + nH,
                                     ew // 2:ew // 2 + nW, :]
                            v = v.astype(jnp.float32) * (sd * sh * sw)
                            acc = v if acc is None else acc + v
                parts.append(acc.reshape(rows, acc.shape[-1]))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    y = [None] * 8           # fp32 accumulators, one per 2^3 output pos
    u = 0
    for ud in range(4):
        for uh in range(4):
            for uw in range(4):
                m = jnp.dot(u_rows(ud, uh, uw).astype(w_ref.dtype),
                            w_ref[u],
                            preferred_element_type=jnp.float32)
                for pd in range(2):
                    cd = dict(_AT_TAPS[pd]).get(ud)
                    if cd is None:
                        continue
                    for ph in range(2):
                        ch = dict(_AT_TAPS[ph]).get(uh)
                        if ch is None:
                            continue
                        for pw in range(2):
                            cw = dict(_AT_TAPS[pw]).get(uw)
                            if cw is None:
                                continue
                            p = (pd * 2 + ph) * 2 + pw
                            t = m * (cd * ch * cw)
                            y[p] = t if y[p] is None else y[p] + t
                u += 1

    for bi in range(b_blk):
        for td in range(T_cd):
            off = (bi * T_cd + td) * rows
            for p in range(8):
                o_ref[bi, td, :, p, :] = \
                    y[p][off:off + rows].astype(o_ref.dtype)


def _fused_impl(x: jax.Array, kernel: jax.Array) -> jax.Array:
    B, D, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    nsplit, plan = _plan_split(B, D, H, W, Cin, Cout)
    if nsplit == 1:
        return _fused_one(x, kernel, plan)
    c = Cin // nsplit
    acc = None
    for i in range(nsplit):
        y = _fused_one(x[..., i * c:(i + 1) * c],
                       kernel[:, :, :, i * c:(i + 1) * c, :], plan)
        y = y.astype(jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def _fused_one(x: jax.Array, kernel: jax.Array,
               plan: Tuple[int, int, int]) -> jax.Array:
    from commonscenes_tpu.ops.winograd import transform_kernel

    B, D, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    nD, nH, nW = D // 2, H // 2, W // 2
    b_blk, T_cd, co_blk = plan

    Bp = -(-B // b_blk) * b_blk
    xp = jnp.pad(x, ((0, Bp - B), (1, 1), (1, 1), (1, 1), (0, 0)))
    # polyphase cells: [Bp, ncD, ncH, ncW, 8, C]; pad ncD so the halo view
    # (block index chunk+1) stays in bounds at the last chunk
    cells = xp.reshape(Bp, nD + 1, 2, nH + 1, 2, nW + 1, 2, Cin) \
        .transpose(0, 1, 3, 5, 2, 4, 6, 7) \
        .reshape(Bp, nD + 1, nH + 1, nW + 1, 8, Cin)
    cells = jnp.pad(
        cells, ((0, 0), (0, T_cd - 1), (0, 0), (0, 0), (0, 0), (0, 0)))

    wt = transform_kernel(kernel, "f2").astype(x.dtype)   # [64, Cin, Cout]

    cblk = (b_blk, T_cd, nH + 1, nW + 1, 8, Cin)
    out = pl.pallas_call(
        functools.partial(_wino_kernel, b_blk=b_blk, T_cd=T_cd,
                          nH=nH, nW=nW),
        grid=(Cout // co_blk, Bp // b_blk, nD // T_cd),
        in_specs=[
            pl.BlockSpec(cblk, lambda co, b, c: (b, c, 0, 0, 0, 0)),
            pl.BlockSpec(cblk, lambda co, b, c: (b, c + 1, 0, 0, 0, 0)),
            pl.BlockSpec((64, Cin, co_blk), lambda co, b, c: (0, 0, co)),
        ],
        out_specs=pl.BlockSpec((b_blk, T_cd, nH * nW, 8, co_blk),
                               lambda co, b, c: (b, c, 0, 0, co)),
        out_shape=jax.ShapeDtypeStruct((Bp, nD, nH * nW, 8, Cout), x.dtype),
        interpret=_interpret(),
    )(cells, cells, wt)

    # [B, nD, nH, nW, pd, ph, pw, C] -> [B, D, H, W, C]
    y = out[:B].reshape(B, nD, nH, nW, 2, 2, 2, Cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, D, H, W, Cout)


@jax.custom_vjp
def conv3d_winograd_fused(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 SAME 3x3x3 conv, fused Winograd forward (see module doc)."""
    return _fused_impl(x, kernel)


def _ref(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _fwd(x, kernel):
    return _fused_impl(x, kernel), (x, kernel)


def _bwd(res, g):
    _, vjp = jax.vjp(_ref, *res)
    return vjp(g.astype(res[0].dtype))


conv3d_winograd_fused.defvjp(_fwd, _bwd)
