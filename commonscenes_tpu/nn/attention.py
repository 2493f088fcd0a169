"""Transformer blocks for the 3D latent denoiser.

Capability parity with the reference's SpatialTransformer3D stack
(model/networks/diffusion_networks/attention.py:154-351): token self-
attention over the flattened d·h·w voxel grid, cross-attention to relation
tokens, GEGLU feed-forward — re-expressed with batched einsums that XLA maps
straight onto the MXU, fp32 softmax, and optional `jax.checkpoint` instead
of the torch re-forward trick (ldm_diffusion_util.py:125-171).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gn_group_count(C: int, num_groups: int = 32) -> int:
    """Group count group_norm actually uses for width C. The reference
    always uses 32 groups (GroupNorm32, ldm_diffusion_util.py:222-239) and
    errors on non-divisible widths; for non-reference widths fall back
    deterministically to the largest divisor of C ≤ num_groups. The
    skip-split seam math in nn/unet3d.py derives group boundaries from this
    same function — keep them in lockstep."""
    if C % num_groups == 0:
        return num_groups
    return next(d for d in range(min(num_groups, C), 0, -1) if C % d == 0)


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-6,
               silu: bool = False) -> jax.Array:
    """Channel-last GroupNorm (+ optional fused SiLU), fp32 math.

    On TPU this dispatches to the fused Pallas kernel (ops/groupnorm.py —
    two HBM touches instead of XLA's multi-pass fp32 lowering, worth ~30%
    of the UNet step); elsewhere it runs the jnp reference path.
    """
    C = x.shape[-1]
    g = gn_group_count(C, num_groups)

    from commonscenes_tpu.ops import groupnorm as gnk
    if x.ndim >= 3 and gnk.on_tpu() and gnk.fused_supported(x.shape, g):
        return gnk.fused_group_norm(x, scale.astype(jnp.float32),
                                    bias.astype(jnp.float32), g, eps, silu)

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    spatial = xf.shape[1:-1]
    xg = xf.reshape(xf.shape[0], -1, g, C // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(xf.shape[0], *spatial, C)
    y = xf * scale + bias
    if silu:
        y = jax.nn.silu(y)
    return y.astype(orig_dtype)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    silu: bool = False   # fuse the following SiLU/swish into the norm

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return group_norm(x, scale, bias, self.num_groups, self.eps,
                          silu=self.silu)


class _DenseParams(nn.Module):
    """Parameter-only Dense: same {kernel[, bias]} tree as nn.Dense so
    checkpoints/importers are unaffected, but the matmul itself is left to
    the caller (the einsum path fuses head split + lane padding into it)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None
        return k, b


class MultiHeadAttention(nn.Module):
    """q from x [B, N, D]; k/v from context [B, M, Dc] (self-attn when
    context is None). Softmax in fp32.

    TPU self-attention path: the head split AND the lane pad (head dims 56
    and 84 pad to the MXU-friendly 64/128) are folded into the projection
    WEIGHTS, so q/k/v come out of the matmul already head-major-padded and
    feed the Pallas kernel with zero transpose/pad copies — worth ~25% of
    the transformer block (the activations are 29 MB each at the 8² stage;
    three transposes + three pads used to ride through HBM)."""

    heads: int = 8
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None,
                 residual: Optional[jax.Array] = None) -> jax.Array:
        """``residual`` (the pre-LayerNorm block input) folds the residual
        add into the fused attention kernel's single output write."""
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]
        ctx = x if context is None else context
        ctx_dim = ctx.shape[-1]
        B, N, _ = x.shape
        M = ctx.shape[1]
        h, d = self.heads, self.dim_head
        dt = self.dtype or x.dtype

        wq, _ = _DenseParams(inner, use_bias=False, name="to_q")(query_dim)
        wk, _ = _DenseParams(inner, use_bias=False, name="to_k")(ctx_dim)
        wv, _ = _DenseParams(inner, use_bias=False, name="to_v")(ctx_dim)
        wo, bo = _DenseParams(query_dim, name="to_out")(inner)

        if context is not None and M == 1:
            # EXACT shortcut: softmax over a single key is identically 1
            # (and its gradient w.r.t. the logit is 0), so cross-attention
            # to one relation token is a value broadcast — the q/k matmuls
            # the reference runs here are dead compute, O(B·N·C²) → O(B·C²)
            v1 = ctx[:, 0].astype(dt) @ wv.astype(dt)        # [B, inner]
            o1 = v1 @ wo.astype(dt) + bo.astype(dt)          # [B, C]
            out = jnp.broadcast_to(o1[:, None, :],
                                   (B, N, query_dim)).astype(x.dtype)
            return out if residual is None else residual + out

        import os
        from commonscenes_tpu.ops import flash_attention as fa
        # stage-size dispatch knobs (A/B; see ops/fused_transformer.py):
        # below *_MIN_N tokens a path hands off to the next one down
        # (fused kernel → flash+einsum-out → pure-XLA einsum attention)
        fused_min_n = int(os.environ.get("COMMONSCENES_FUSED_ATTN_MIN_N", "0"))
        flash_min_n = int(os.environ.get("COMMONSCENES_FLASH_MIN_N", "0"))
        if context is None and fa.on_tpu() and N >= flash_min_n \
                and fa.self_attention_supported(N, d):
            Dp = max((d + 63) // 64 * 64, 64)

            def fold(w):
                # [C, h·d] → [C, h, Dp]: zero lanes absorb the pad; XLA
                # fuses the head-major output layout into the matmul
                w3 = w.reshape(-1, h, d)
                if Dp != d:
                    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, Dp - d)))
                return w3.astype(dt)

            q = jnp.einsum("bnc,chd->bhnd", x.astype(dt), fold(wq))
            k = jnp.einsum("bnc,chd->bhnd", x.astype(dt), fold(wk))
            v = jnp.einsum("bnc,chd->bhnd", x.astype(dt), fold(wv))
            # padded v lanes are zero → padded o lanes are zero; the padded
            # rows of the folded output weight are zeroed anyway
            wo3 = wo.reshape(h, d, query_dim)
            if Dp != d:
                wo3 = jnp.pad(wo3, ((0, 0), (0, Dp - d), (0, 0)))

            from commonscenes_tpu.ops import fused_transformer as ft
            if residual is not None and N >= fused_min_n \
                    and os.environ.get("COMMONSCENES_FUSED_ATTN", "1") != "0" \
                    and ft.attn_out_supported(B, h, N, Dp, query_dim):
                # softmax core + out projection + residual: one HBM write
                return ft.attn_out_fused(q, k, v, residual.astype(dt),
                                         wo3.astype(dt), bo, d ** -0.5)

            o = fa.flash_attention_padded(q.reshape(B * h, N, Dp),
                                          k.reshape(B * h, N, Dp),
                                          v.reshape(B * h, N, Dp),
                                          d ** -0.5)
            o = o.reshape(B, h, N, Dp)
            out = jnp.einsum("bhnd,hdc->bnc", o, wo3.astype(dt))
            out = (out + bo.astype(dt)).astype(x.dtype)
            return out if residual is None else residual + out

        q = (x.astype(dt) @ wq.astype(dt)).reshape(B, N, h, d)
        k = (ctx.astype(dt) @ wk.astype(dt)).reshape(B, M, h, d)
        v = (ctx.astype(dt) @ wv.astype(dt)).reshape(B, M, h, d)

        scale = d ** -0.5
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                         preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, inner).astype(dt)
        out = (out @ wo.astype(dt) + bo.astype(dt)).astype(x.dtype)
        return out if residual is None else residual + out


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU to match torch F.gelu (reference GEGLU,
        # attention.py:39-46); jax defaults to the tanh approximation
        return a * jax.nn.gelu(gate, approximate=False)


class _GegluParams(nn.Module):
    """Parameter twin of GEGLU (child Dense 'proj') for the fused path."""

    dim_out: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.dim_out * 2, name="proj")(in_features)


class FeedForward(nn.Module):
    """GEGLU feed-forward. When ``ln_scale``/``ln_bias`` are given, the
    whole LayerNorm → GEGLU → out-proj → +residual chain runs as ONE
    Pallas kernel on TPU (ops/fused_transformer.ffn_fused) — the
    [tokens, 8·C] GEGLU intermediate never touches HBM. Param tree is
    identical to the unfused module (geglu/proj + out)."""

    mult: int = 4
    dtype: Optional[jnp.dtype] = None
    # static inference hint: the f-tiled FFN kernel is forward-only
    # (training programs crash the TPU compile helper with it; see
    # ops/fused_transformer._ffn_impl)
    inference: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 ln_scale: Optional[jax.Array] = None,
                 ln_bias: Optional[jax.Array] = None) -> jax.Array:
        dim = x.shape[-1]
        if ln_scale is None:
            h = GEGLU(dim * self.mult, dtype=self.dtype, name="geglu")(x)
            return nn.Dense(dim, dtype=self.dtype, name="out")(h)

        F = dim * self.mult
        dt = self.dtype or x.dtype
        w1, b1 = _GegluParams(F, name="geglu")(dim)
        w2, b2 = _DenseParams(dim, name="out")(F)
        import os
        from commonscenes_tpu.ops import fused_transformer as ft
        x2 = x.reshape(-1, dim)
        if jax.default_backend() == "tpu" \
                and os.environ.get("COMMONSCENES_FUSED_FFN", "1") != "0":
            out = ft.ffn_fused(x2.astype(dt), ln_scale, ln_bias,
                               w1.astype(dt), b1, w2.astype(dt), b2,
                               1e-5, self.inference)
        else:
            out = ft.ffn_reference(x2.astype(dt), ln_scale, ln_bias,
                                   w1.astype(dt), b1, w2.astype(dt), b2)
        return out.reshape(x.shape).astype(x.dtype)


class _LNParams(nn.Module):
    """Parameter twin of nn.LayerNorm ({scale, bias})."""

    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,))
        return s, b


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn(context) → GEGLU FF, each pre-LayerNormed
    with residuals (reference attention.py:222-245)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    inference: bool = False   # static hint, see FeedForward.inference

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        # residual folded into the fused attention kernel's output write
        x = MultiHeadAttention(self.heads, self.dim_head, dtype=self.dtype,
                               name="attn1")(
            nn.LayerNorm(dtype=self.dtype, epsilon=1e-5, name="norm1")(x),
            residual=x)
        x = x + MultiHeadAttention(self.heads, self.dim_head, dtype=self.dtype,
                                   name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context=context)
        # LayerNorm + GEGLU + out-proj + residual as one fused kernel
        ln_s, ln_b = _LNParams(name="norm3")(x.shape[-1])
        x = FeedForward(dtype=self.dtype, inference=self.inference,
                        name="ff")(x, ln_scale=ln_s, ln_bias=ln_b)
        return x


class SpatialTransformer3D(nn.Module):
    """Flattens a [B, D, H, W, C] voxel feature map into D·H·W tokens, runs
    ``depth`` transformer blocks with cross-attention to ``context``
    [B, M, context_dim], and projects back with a zero-initialized output so
    the block starts as identity (reference attention.py:298-351)."""

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_checkpoint: bool = True
    dtype: Optional[jnp.dtype] = None
    inference: bool = False   # static hint, see FeedForward.inference

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        B, D, H, W, C = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        h = GroupNorm(name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)  # 1x1x1 conv
        tokens = h.reshape(B, D * H * W, inner)

        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=())
        for i in range(self.depth):
            tokens = block_cls(self.heads, self.dim_head,
                               context_dim=self.context_dim, dtype=self.dtype,
                               inference=self.inference,
                               name=f"block_{i}")(tokens, context)

        h = tokens.reshape(B, D, H, W, inner)
        h = nn.Dense(C, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="proj_out")(h)
        return x_in + h
