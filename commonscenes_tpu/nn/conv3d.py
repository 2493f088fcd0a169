"""TPU-tuned 3D convolution lowering.

XLA lowers rank-3 ``conv_general_dilated`` on TPU acceptably but ~25% below
what the same contraction achieves as 2D convs (measured on v5e:
68 → 87 TFLOPS for the UNet's 16³×224ch operating point). ``conv3d``
decomposes a k_d×k_h×k_w kernel into k_d depth taps, each a 2D conv over a
[B·D_out, H, W] batch, accumulated in fp32 — numerically identical
(elementwise max |Δ| at bf16 resolution) with the same parameter pytree as
``nn.Conv`` (kernel [kd, kh, kw, Cin, Cout], bias [Cout]) so checkpoints
are interchangeable.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Trace-time flag: True while an inference-only program (sampling) is being
# traced. UNet3D.__call__ sets it from its static ``inference`` argument.
# Lets COMMONSCENES_CONV_WINO_SCOPE=inference deploy a Winograd lowering on
# the sampling path only — the forward-only Mosaic program is a different
# compile than fwd+bwd (the f-tiled FFN kernel crashed the latter; same
# insurance here).
_INFERENCE_TRACE = False


@contextlib.contextmanager
def inference_trace(on: bool):
    global _INFERENCE_TRACE
    prev = _INFERENCE_TRACE
    _INFERENCE_TRACE = bool(on)
    try:
        yield
    finally:
        _INFERENCE_TRACE = prev


def conv3d_2dsum(x: jax.Array, kernel: jax.Array,
                 strides: Tuple[int, int, int] = (1, 1, 1),
                 padding: Tuple[Tuple[int, int], ...] = ((1, 1), (1, 1), (1, 1)),
                 preferred_element_type=jnp.float32) -> jax.Array:
    """x [B,D,H,W,Cin], kernel [kd,kh,kw,Cin,Cout] → [B,D',H',W',Cout]."""
    B, D, H, W, Cin = x.shape
    kd = kernel.shape[0]
    sd, sh, sw = strides
    (pd_lo, pd_hi), ph, pw = padding[0], padding[1], padding[2]

    xp = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
    Dp = D + pd_lo + pd_hi
    D_out = (Dp - kd) // sd + 1

    acc = None
    for t in range(kd):
        # depth slice for tap t: indices t, t+sd, ..., t+sd*(D_out-1)
        xk = jax.lax.slice_in_dim(xp, t, t + sd * (D_out - 1) + 1, sd, axis=1)
        xk = xk.reshape(B * D_out, H, W, Cin)
        # NOTE: no preferred_element_type here — the MXU accumulates fp32
        # internally regardless, and a widened output dtype breaks the conv
        # transpose (VJP) with mixed operand dtypes. Cross-tap accumulation
        # is explicit fp32.
        y = jax.lax.conv_general_dilated(
            xk, kernel[t], (sh, sw), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.astype(preferred_element_type)
        acc = y if acc is None else acc + y
    H_out, W_out, Cout = acc.shape[1], acc.shape[2], acc.shape[3]
    return acc.reshape(B, D_out, H_out, W_out, Cout).astype(x.dtype)


class Conv3D(nn.Module):
    """Drop-in NDHWC conv layer using the 2D-sum lowering. Parameter layout
    matches flax nn.Conv exactly."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: object = 1     # int | 'VALID' | per-dim tuples
    use_bias: bool = True
    kernel_init: object = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        Cin = x.shape[-1]
        kd, kh, kw = self.kernel_size
        init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (kd, kh, kw, Cin, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None

        if self.padding == "VALID":
            pads = ((0, 0), (0, 0), (0, 0))
        elif isinstance(self.padding, int):
            p = self.padding
            pads = ((p, p), (p, p), (p, p))
        else:
            pads = tuple(tuple(p) for p in self.padding)

        dt = self.dtype or x.dtype
        y = conv3d(x.astype(dt), kernel.astype(dt), self.strides, pads)
        y = y.astype(dt)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


def conv3d(x: jax.Array, kernel: jax.Array,
           strides: Tuple[int, int, int] = (1, 1, 1),
           padding: Tuple[Tuple[int, int], ...] = ((1, 1), (1, 1), (1, 1))
           ) -> jax.Array:
    """Shape-dispatched 3D conv. Default: XLA's native rank-3 conv.

    Round-3 end-to-end A/B on the v5e (full v2_full sampling program,
    honest host-fetch timing, BENCH protocol):
      direct everywhere      0.1493 scenes/s   ← default
      2dsum at 16³ stage     0.1442
      2dsum at 8²/4² stages  0.1360
      pallas at 8²/4² stages 0.1322
    ISOLATED microbenches invert this ordering (2dsum measures 96-99
    TFLOP/s vs direct's pathological isolated numbers) — but in-program,
    XLA fuses the surrounding GroupNorm/SiLU/residual elementwise work
    into the native conv, which the 2dsum slicing and the Pallas call
    boundary both break. The alternatives stay selectable for A/B:
    COMMONSCENES_CONV_LARGE=2dsum (H·W ≥ 256),
    COMMONSCENES_CONV_SMALL=2dsum|pallas (H·W < 256;
    ops/pallas_conv3d.py is the tap-accumulate kernel).
    """
    wino = os.environ.get("COMMONSCENES_CONV_WINO", "0")
    if wino != "0" and not _INFERENCE_TRACE and \
            os.environ.get("COMMONSCENES_CONV_WINO_SCOPE", "all") == "inference":
        wino = "0"
    if wino != "0" and x.shape[2] * x.shape[3] < int(
            os.environ.get("COMMONSCENES_WINO_MIN_HW", "0")):
        # stage-size gate, like the attention MIN_N knobs: lets an A/B mix
        # Winograd at the big stages with direct conv at the tiny 4x4 ones
        wino = "0"
    if wino == "pallas":
        from commonscenes_tpu.ops import pallas_winograd as pw
        if pw.supports(x.shape, kernel.shape, strides, padding):
            return pw.conv3d_winograd_fused(x, kernel)
        wino = "f2"     # geometry the fused kernel can't plan → XLA f2
    if wino in ("f2", "f4"):
        from commonscenes_tpu.ops import winograd as wg
        if wg.supports(x.shape, kernel.shape, strides, padding, wino):
            return wg.conv3d_winograd(x, kernel, variant=wino)
    H, W = x.shape[2], x.shape[3]
    if H * W >= 256:
        if os.environ.get("COMMONSCENES_CONV_LARGE", "direct") == "2dsum":
            return conv3d_2dsum(x, kernel, strides, padding)
    else:
        small = os.environ.get("COMMONSCENES_CONV_SMALL", "direct")
        if small == "pallas" and jax.default_backend() == "tpu":
            from commonscenes_tpu.ops import pallas_conv3d as pc
            if pc.supports(x.shape, kernel.shape, strides, padding):
                return pc.conv3d_pallas(x, kernel)
        if small == "2dsum":
            return conv3d_2dsum(x, kernel, strides, padding)
    y = jax.lax.conv_general_dilated(
        x, kernel, strides, list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y.astype(x.dtype)
