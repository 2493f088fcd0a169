"""Winograd 3D convolution (F(2,3)^3 and F(4,3)^3) as batched MXU matmuls.

The UNet's hot loop is stride-1 3x3x3 convolutions (reference
model/networks/diffusion_networks/network_ae/openai_model_3d.py:202-315 res
blocks); measured in-program they run at ~110 TFLOP/s on v5e — the MXU is
the floor, so the only way down is fewer MACs. Winograd's minimal filtering
computes an m^3 output tile from an a^3 = (m+2)^3 input tile with a^3
multiplies instead of 27*m^3:

    F(2,3)^3:  64 /  8 outputs = 8  mult/output  -> 3.375x fewer MACs
    F(4,3)^3: 216 / 64 outputs = 3.375 mult/out  -> 8x fewer MACs

The transformed domain is a batched matmul ``[a^3, tiles, Cin] x
[a^3, Cin, Cout]`` — exactly what the MXU wants — and the input/output
transforms are dense networks of adds over strided slices that XLA fuses
into VPU work around the matmuls.

Numerics: all transform arithmetic runs in fp32 (buffers stay in the
compute dtype); the tile matmul accumulates fp32. F(2,3) transform entries
are {0, +-1, +-1/2} — measured bf16 error is ~2.2x a direct bf16 conv's
own rounding, fine for the bf16 sampling path. F(4,3) is ~21x direct at
the standard points {0,+-1,+-2} and no interpolation-point choice fixes
it (best found: {0,+-2,+-1/2} at ~13x; U-side and W-side bf16 rounding
contribute equally, so a split-high/low-U repair needs >=3 matmuls —
worse arithmetic than f2's 3.375x). f4 therefore stays fp32-only /
experimental; COMMONSCENES_CONV_WINO=f2 is the deployable setting
(see nn/conv3d.py; tests/test_winograd.py pins both error ratios).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# F(m, 3) 1-D transform matrices (Lavin & Gray, "Fast Algorithms for
# Convolutional Neural Networks", arXiv:1509.09308 — public algorithm).
_PARAMS = {
    "f2": dict(
        m=2, a=4,
        G=np.array([[1, 0, 0],
                    [.5, .5, .5],
                    [.5, -.5, .5],
                    [0, 0, 1]], np.float32),
    ),
    "f4": dict(
        m=4, a=6,
        G=np.array([[1 / 4, 0, 0],
                    [-1 / 6, -1 / 6, -1 / 6],
                    [-1 / 6, 1 / 6, -1 / 6],
                    [1 / 24, 1 / 12, 1 / 6],
                    [1 / 24, -1 / 12, 1 / 6],
                    [0, 0, 1]], np.float32),
    ),
}


def supports(x_shape: Tuple[int, ...], kernel_shape: Tuple[int, ...],
             strides, padding, variant: str) -> bool:
    """Stride-1 SAME 3x3x3 with every spatial dim divisible by the tile."""
    if variant not in _PARAMS:
        return False
    if tuple(strides) != (1, 1, 1) or kernel_shape[:3] != (3, 3, 3):
        return False
    if tuple(map(tuple, padding)) != ((1, 1), (1, 1), (1, 1)):
        return False
    # tiny channel counts (UNet conv_in/conv_out, z_channels=3): transform
    # traffic dominates the trivial matmul — direct conv wins there
    if x_shape[4] < 32 or kernel_shape[4] < 32:
        return False
    m = _PARAMS[variant]["m"]
    return all(d % m == 0 and d >= m for d in x_shape[1:4])


def _offset_slices(t: jax.Array, axis: int, m: int, a: int,
                   n: int) -> List[jax.Array]:
    """The a interleaved views t[..., s::m, ...][:n] for s in range(a):
    tile j's window along `axis` is [m*j, m*j + a), so view s holds element
    s of every tile."""
    return [jax.lax.slice_in_dim(t, s, s + m * (n - 1) + 1, m, axis=axis)
            for s in range(a)]


def _bt_f2(x: List[jax.Array]) -> List[jax.Array]:
    # B^T rows for F(2,3): entries {0, +-1}
    return [x[0] - x[2], x[1] + x[2], x[2] - x[1], x[1] - x[3]]


def _bt_f4(x: List[jax.Array]) -> List[jax.Array]:
    # B^T rows for F(4,3): [[4,0,-5,0,1,0], [0,-4,-4,1,1,0], [0,4,-4,-1,1,0],
    # [0,-2,-1,2,1,0], [0,2,-1,-2,1,0], [0,4,0,-5,0,1]]
    a24 = x[2] + x[4]
    b13 = x[1] + x[3]
    return [4.0 * x[0] - 5.0 * x[2] + x[4],
            b13 + a24 - 5.0 * x[2] - 5.0 * x[1],   # -4x1 -4x2 +x3 +x4
            4.0 * (x[1] - x[2]) - x[3] + x[4],
            2.0 * (x[3] - x[1]) - x[2] + x[4],
            2.0 * (x[1] - x[3]) - x[2] + x[4],
            4.0 * x[1] - 5.0 * x[3] + x[5]]


def _at_f2(mcol: List[jax.Array]) -> List[jax.Array]:
    # A^T rows: [[1,1,1,0], [0,1,-1,-1]]
    return [mcol[0] + mcol[1] + mcol[2], mcol[1] - mcol[2] - mcol[3]]


def _at_f4(mcol: List[jax.Array]) -> List[jax.Array]:
    # A^T rows: [[1,1,1,1,1,0], [0,1,-1,2,-2,0], [0,1,1,4,4,0],
    #            [0,1,-1,8,-8,1]]
    s12, d12 = mcol[1] + mcol[2], mcol[1] - mcol[2]
    s34, d34 = mcol[3] + mcol[4], mcol[3] - mcol[4]
    return [mcol[0] + s12 + s34,
            d12 + 2.0 * d34,
            s12 + 4.0 * s34,
            d12 + 8.0 * d34 + mcol[5]]


_BT = {"f2": _bt_f2, "f4": _bt_f4}
_AT = {"f2": _at_f2, "f4": _at_f4}


def transform_kernel(kernel: jax.Array, variant: str) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [a^3, Cin, Cout] (G x G x G) in fp32.

    Loop-invariant under lax.scan over diffusion steps (the weights are
    carried constants), so XLA hoists this out of the sampling loop.
    """
    G = jnp.asarray(_PARAMS[variant]["G"])
    k = kernel.astype(jnp.float32)
    w = jnp.einsum("di,hj,wk,ijkco->dhwco", G, G, G, k)
    a = _PARAMS[variant]["a"]
    return w.reshape(a ** 3, *kernel.shape[3:])


def conv3d_winograd(x: jax.Array, kernel: jax.Array,
                    variant: str = "f4") -> jax.Array:
    """x [B,D,H,W,Cin] (*) kernel [3,3,3,Cin,Cout], stride 1, SAME pad.

    Transform arithmetic in fp32; the a^3-batched tile matmul runs in the
    input dtype with fp32 accumulation.
    """
    p = _PARAMS[variant]
    m, a = p["m"], p["a"]
    bt, at = _BT[variant], _AT[variant]
    B, D, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    nD, nH, nW = D // m, H // m, W // m
    R = B * nD * nH * nW

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # input-transform stage buffers: fp32 by default; bf16 halves the
    # chain's HBM traffic for 2.79x -> 3.40x direct-conv rounding (f2,
    # measured) — A/B end-to-end via COMMONSCENES_WINO_DTYPE=bf16
    import os
    if os.environ.get("COMMONSCENES_WINO_DTYPE", "fp32") != "bf16":
        xp = xp.astype(jnp.float32)

    # Input transform, one spatial axis at a time. Each stage maps a list
    # of arrays to an a-times-longer list of element-wise combinations of
    # strided views — pure VPU adds, no materialised blow-up beyond the
    # final transformed tensor.
    ts = [xp]                                 # [B, D+2, H+2, W+2, C]
    out: List[jax.Array] = []
    for t in ts:
        out.extend(bt(_offset_slices(t, 1, m, a, nD)))
    ts, out = out, []                         # a  x [B, nD, H+2, W+2, C]
    for t in ts:
        out.extend(bt(_offset_slices(t, 2, m, a, nH)))
    ts, out = out, []                         # a² x [B, nD, nH, W+2, C]
    for t in ts:
        out.extend(bt(_offset_slices(t, 3, m, a, nW)))
    #                                           a³ x [B, nD, nH, nW, C]
    U = jnp.stack(out, axis=0).reshape(a ** 3, R, Cin).astype(x.dtype)

    Wt = transform_kernel(kernel, variant).astype(x.dtype)
    # fp32 MXU accumulation, but the M buffer stays in the compute dtype:
    # halves its HBM traffic for +0.4x direct-conv-rounding error
    # (measured 2.36x -> 2.79x, see module docstring protocol)
    M = jnp.einsum("prc,pco->pro", U, Wt,
                   preferred_element_type=jnp.float32).astype(x.dtype)

    # Output transform: contract the a³ axis down to m³ one axis at a time,
    # fp32 arithmetic (the upcast fuses into the transform's VPU work).
    cols = [M[i].astype(jnp.float32) for i in range(a ** 3)]
    nxt: List[jax.Array] = []
    for d in range(a):
        for h in range(a):
            nxt.extend(at([cols[(d * a + h) * a + w] for w in range(a)]))
    cols, nxt = nxt, []                       # (d, h, w_out): a*a*m
    for d in range(a):
        for w in range(m):
            nxt.extend(at([cols[(d * a + h) * m + w] for h in range(a)]))
    # _at returns the m outputs for fixed (d, w) → order (d, w_out, h_out)
    cols, nxt = nxt, []
    for w in range(m):
        for h in range(m):
            nxt.extend(at([cols[(d * m + w) * m + h] for d in range(a)]))
    # order (w_out, h_out, d_out), each [R, Cout] fp32
    Y = jnp.stack(nxt, axis=0).reshape(m, m, m, B, nD, nH, nW, Cout)
    # [w, h, d, B, nD, nH, nW, C] -> [B, nD, d, nH, h, nW, w, C]
    Y = Y.transpose(3, 4, 2, 5, 1, 6, 0, 7)
    return Y.reshape(B, D, H, W, Cout).astype(x.dtype)
