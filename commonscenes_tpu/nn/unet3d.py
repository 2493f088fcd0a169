"""3D latent-denoiser UNet, TPU-native (NDHWC, bf16-capable).

Capability parity with the reference ``UNet3DModel``
(model/networks/diffusion_networks/openai_model_3d.py:452-789) at the
config/sdfusion-txt2shape.yaml operating point: model_channels 224,
channel_mult (1,2,3), 2 res blocks/level, spatial-transformer attention at
downsample factors {4, 2}, context_dim 1280, sinusoidal time embedding.

Faithfully reproduced semantics that matter for parity:
* dims=3 down/up-sampling touches ONLY the inner two spatial axes
  (openai_model_3d.py:150-158 and :188 — stride (1,2,2)), so a 16³ latent
  runs 16×16×16 → 16×8×8 → 16×4×4 with depth pinned at 16.
* zero-initialized output convs on res blocks / transformers / final head.
* time embedding is [cos, sin] ordered (ldm_diffusion_util.py:174-195).

TPU redesign: channels-last layout feeds XLA's conv-to-MXU tiling, group
norms run in fp32, everything else can run bf16, and ``use_checkpoint``
maps to ``nn.remat`` instead of the torch CheckpointFunction.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from commonscenes_tpu.core.config import UNetConfig
from commonscenes_tpu.nn.attention import (GroupNorm, SpatialTransformer3D,
                                           gn_group_count, group_norm)
from commonscenes_tpu.nn.conv3d import Conv3D, conv3d, inference_trace


# the skip-split seam math must agree with group_norm's real grouping,
# so the group count comes from the same function
_gn_groups = gn_group_count


def skip_split_supported(h_ch: int, skip_ch: int, out_ch: int) -> bool:
    """True when a decoder res block over concat([h, skip], -1) can compute
    (most of) the skip-side norm1/conv1/skip-projection once at batch K.

    Aligned case (group size divides h_ch): the whole skip side splits.
    Span case (one group straddles the seam): the straddling group's stats
    mix CFG-half-dependent h channels with shared skip channels, so only
    that group's few skip channels run at 2K — the remaining pure-skip
    groups still run at K. Requires the residual projection to exist and
    at least one pure-skip group."""
    in_ch = h_ch + skip_ch
    if in_ch == out_ch:
        return False
    gsz = in_ch // _gn_groups(in_ch)
    a_h = h_ch % gsz
    if a_h == 0:
        return True
    # span case needs at least one pure-h group (ResBlock3D normalizes
    # x[..., :h_ch - a_h] separately) and one pure-skip group
    return h_ch - a_h >= gsz and skip_ch - (gsz - a_h) >= gsz


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings, [N] → [N, dim], cos-first ordering."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def conv3(features: int, name: str, zero_init: bool = False,
          strides=(1, 1, 1), dtype=None) -> Conv3D:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return Conv3D(features, kernel_size=(3, 3, 3), strides=strides,
                  padding=1, kernel_init=init, dtype=dtype, name=name)


class _GNParams(nn.Module):
    """Parameter twin of GroupNorm ({scale, bias}), used by the split call
    form so the pytree matches the fused module exactly."""

    @nn.compact
    def __call__(self, C: int):
        s = self.param("scale", nn.initializers.ones, (C,))
        b = self.param("bias", nn.initializers.zeros, (C,))
        return s, b


class _Conv1Params(nn.Module):
    """Parameter twin of the 1×1×1 nn.Conv residual projection."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, 1, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResBlock3D(nn.Module):
    """GN→SiLU→conv, +time-emb, GN→SiLU→zero-conv, with skip projection
    (reference openai_model_3d.py:202-314, use_scale_shift_norm=False).

    Split call form (``skip`` given): ``x`` [2K, ...] is the CFG-doubled
    decoder hidden and ``skip`` [K, ...] a context-free encoder skip shared
    verbatim by both CFG halves. The logical input is
    concat([x, tile2(skip)], -1); because the GroupNorm group boundaries
    align with the concat seam (caller checks ``skip_split_supported``),
    norm1, conv1 and the residual projection are linear in the two channel
    slices — the skip-side work runs ONCE at batch K and is duplicated.
    Same math as the standard form on the tiled concat (conv reductions
    re-associate, so equality is to fp tolerance, not bitwise)."""

    out_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array,
                 deterministic: bool = True,
                 skip: Optional[jax.Array] = None) -> jax.Array:
        dt = self.dtype or x.dtype
        if skip is not None:
            h_ch, s_ch = x.shape[-1], skip.shape[-1]
            in_ch = h_ch + s_ch
            gsc, gbi = _GNParams(name="norm1")(in_ch)
            k1, b1 = _Conv3Params(self.out_channels, name="conv1")(in_ch)
            gsz = in_ch // _gn_groups(in_ch)
            a_h = h_ch % gsz
            if a_h == 0:
                # aligned seam: the whole skip side normalizes+convolves at K
                hn = group_norm(x, gsc[:h_ch], gbi[:h_ch], h_ch // gsz,
                                eps=1e-5, silu=True)
                sn = group_norm(skip, gsc[h_ch:], gbi[h_ch:], s_ch // gsz,
                                eps=1e-5, silu=True)
                ya = conv3d(hn.astype(dt), k1[..., :h_ch, :].astype(dt))
                yb = conv3d(sn.astype(dt), k1[..., h_ch:, :].astype(dt))
                h = ya + jnp.concatenate([yb, yb], axis=0) + b1.astype(dt)
            else:
                # one group straddles the seam: its gsz channels (a_h from h,
                # m_s from skip) need joint per-CFG-half statistics; the
                # g_h pure-h groups run at 2K and the pure-skip groups at K
                m_s = gsz - a_h            # skip channels in the mixed group
                ph = h_ch - a_h            # pure-h channel count
                hn = group_norm(x[..., :ph], gsc[:ph], gbi[:ph], ph // gsz,
                                eps=1e-5, silu=True)
                sn = group_norm(skip[..., m_s:], gsc[h_ch + m_s:],
                                gbi[h_ch + m_s:], (s_ch - m_s) // gsz,
                                eps=1e-5, silu=True)
                # mixed-group statistics: shared skip moments + per-half h
                # moments over (spatial × gsz channels), fp32
                xm = x[..., ph:].astype(jnp.float32)          # [2K, ..., a_h]
                sm = skip[..., :m_s].astype(jnp.float32)      # [K, ..., m_s]
                red = tuple(range(1, x.ndim))
                n_tot = float(math.prod(x.shape[1:-1])) * gsz
                s_h = jnp.sum(xm, axis=red)
                q_h = jnp.sum(xm * xm, axis=red)
                s_s = jnp.tile(jnp.sum(sm, axis=red), 2)
                q_s = jnp.tile(jnp.sum(sm * sm, axis=red), 2)
                mean = (s_h + s_s) / n_tot
                rstd = jax.lax.rsqrt(
                    jnp.maximum((q_h + q_s) / n_tot - mean * mean, 0.0)
                    + 1e-5)
                bshape = (-1,) + (1,) * (x.ndim - 1)
                mean_b = mean.reshape(bshape)
                rstd_b = rstd.reshape(bshape)

                def norm_mix(v, sc, bi):
                    y = (v - mean_b) * rstd_b * sc + bi
                    return jax.nn.silu(y).astype(dt)

                xm_n = norm_mix(xm, gsc[ph:h_ch], gbi[ph:h_ch])
                sm2 = jnp.concatenate([sm, sm], axis=0)
                sm_n = norm_mix(sm2, gsc[h_ch:h_ch + m_s],
                                gbi[h_ch:h_ch + m_s])
                ya = conv3d(jnp.concatenate([hn.astype(dt), xm_n, sm_n], -1),
                            k1[..., :h_ch + m_s, :].astype(dt))
                yb = conv3d(sn.astype(dt), k1[..., h_ch + m_s:, :].astype(dt))
                h = ya + jnp.concatenate([yb, yb], axis=0) + b1.astype(dt)
        else:
            in_ch = x.shape[-1]
            h = GroupNorm(silu=True, eps=1e-5, name="norm1")(x)
            h = conv3(self.out_channels, "conv1", dtype=self.dtype)(h)

        emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                           name="emb_proj")(nn.silu(emb))
        h = h + emb_out[:, None, None, None, :].astype(h.dtype)

        h = GroupNorm(silu=True, eps=1e-5, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3(self.out_channels, "conv2", zero_init=True, dtype=self.dtype)(h)

        if skip is not None:
            ks, bs = _Conv1Params(self.out_channels, name="skip")(in_ch)
            xa = x.astype(dt) @ ks[0, 0, 0, :h_ch].astype(dt)
            xb = skip.astype(dt) @ ks[0, 0, 0, h_ch:].astype(dt)
            res = xa + jnp.concatenate([xb, xb], axis=0) + bs.astype(dt)
            return res + h

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                        dtype=self.dtype, name="skip")(x)
        return x + h


class DownsampleHW(nn.Module):
    """Strided conv halving H and W only (reference stride (1,2,2))."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv3(self.channels, "op", strides=(1, 2, 2), dtype=self.dtype)(x)


class _Conv3Params(nn.Module):
    """Parameter twin of conv3 (kernel [3,3,3,Cin,Cout] + bias), same
    pytree as nn.Conv so checkpoints/importers are unaffected."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class UpsampleHW(nn.Module):
    """Nearest-neighbor 2× on H and W only, then 3³ conv (reference
    openai_model_3d.py:150-158 Upsample with dims=3, stride (1,2,2)).

    TPU lowering: the conv-after-nearest-upsample is computed by parity
    decomposition (the sub-pixel/transposed-conv identity). Every output
    voxel at H/W parity (a, b) reads each coarse source voxel through a
    fixed pair of adjacent 3³ taps, so the 27-tap conv on the upsampled
    grid collapses to four [3, 2, 2]-tap convs on the COARSE grid with
    pre-summed weights — identical sums, 12/27 of the MACs (profiled:
    the two upsample convs were 7.6 ms of a 67.9 ms UNet forward at
    full cost). `COMMONSCENES_UPSAMPLE=naive` restores the materialized
    repeat→conv path for A/B."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, D, H, W, C = x.shape
        if os.environ.get("COMMONSCENES_UPSAMPLE", "parity") == "naive":
            x = jnp.repeat(x, 2, axis=2)
            x = jnp.repeat(x, 2, axis=3)
            return conv3(self.channels, "conv", dtype=self.dtype)(x)

        k, bias = _Conv3Params(self.channels, name="conv")(C)
        dt = self.dtype or x.dtype
        kf = k.astype(jnp.float32)
        # output row 2i+a reads coarse rows: a=0 → (i-1: w0, i: w1+w2);
        # a=1 → (i: w0+w1, i+1: w2). Same for columns. Zero padding on the
        # upsampled grid maps exactly onto coarse-grid zero padding.
        h_taps = {0: jnp.stack([kf[:, 0], kf[:, 1] + kf[:, 2]], axis=1),
                  1: jnp.stack([kf[:, 0] + kf[:, 1], kf[:, 2]], axis=1)}
        xd = x.astype(dt)
        quads = []
        for a in (0, 1):
            kh = h_taps[a]                       # [3, 2, 3, C, Cout]
            w_taps = {0: jnp.stack([kh[:, :, 0], kh[:, :, 1] + kh[:, :, 2]],
                                   axis=2),
                      1: jnp.stack([kh[:, :, 0] + kh[:, :, 1], kh[:, :, 2]],
                                   axis=2)}
            row = []
            for b in (0, 1):
                pad = [(1, 1), (1, 0) if a == 0 else (0, 1),
                       (1, 0) if b == 0 else (0, 1)]
                y = jax.lax.conv_general_dilated(
                    xd, w_taps[b].astype(dt), (1, 1, 1), pad,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                row.append(y.astype(dt))
            quads.append(jnp.stack(row, axis=4))  # [B,D,H,W,2,Cout]
        y = jnp.stack(quads, axis=3)              # [B,D,H,2,W,2,Cout]
        y = y.reshape(B, D, 2 * H, 2 * W, self.channels)
        return y + bias.astype(dt)


class UNet3D(nn.Module):
    """The denoiser ε̂(x_t, t, context). Input/output [B, D, H, W, C].

    ``cfg_pair=True`` is the inference-time classifier-free-guidance path:
    ``x``/``timesteps`` have batch K while ``context`` is the 2K stack
    [uncond ‖ cond]. Both CFG halves share identical x and t, so every
    block BEFORE the first cross-attention is computed once at batch K and
    only then duplicated — identical math to the naive 2K batch (the
    reference always runs the doubled batch, samplers/ddim.py:205-210), at
    ~⅔ of the encoder conv cost.
    """

    cfg: UNetConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 context: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 cfg_pair: bool = False,
                 inference: bool = False) -> jax.Array:
        # conv3d's trace-time dispatch can gate Winograd to inference-only
        # programs (COMMONSCENES_CONV_WINO_SCOPE=inference)
        with inference_trace(inference):
            return self._forward(x, timesteps, context, deterministic,
                                 cfg_pair, inference)

    def _forward(self, x: jax.Array, timesteps: jax.Array,
                 context: Optional[jax.Array],
                 deterministic: bool,
                 cfg_pair: bool,
                 inference: bool) -> jax.Array:
        cfg = self.cfg
        mc = cfg.model_channels
        time_dim = mc * 4

        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_0")(t_emb.astype(
            self.dtype or jnp.float32))
        emb = nn.silu(emb)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_1")(emb)

        # lazy CFG duplication state: everything is context-free (shared by
        # the uncond/cond halves) until the first spatial transformer
        doubled = not cfg_pair

        def tile2(a):
            return jnp.concatenate([a, a], axis=0)

        def attn_layer(ch: int, name: str):
            heads = cfg.num_heads
            return SpatialTransformer3D(
                heads=heads, dim_head=ch // heads, depth=cfg.transformer_depth,
                context_dim=cfg.context_dim, use_checkpoint=cfg.use_checkpoint,
                dtype=self.dtype, inference=inference, name=name)

        h = conv3(mc, "conv_in", dtype=self.dtype)(x.astype(self.dtype or x.dtype))
        hs = [h]
        ds = 1
        block = 0
        # --- encoder ---
        for level, mult in enumerate(cfg.channel_mult):
            ch = mc * mult
            for _ in range(cfg.num_res_blocks):
                h = ResBlock3D(ch, cfg.dropout, dtype=self.dtype,
                               name=f"down_res_{block}")(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    if not doubled:
                        # skips stay at batch K — the decoder either splits
                        # them out of the concat (context-free skip-side
                        # compute once at K) or tiles them at pop time
                        h = tile2(h)
                        emb = tile2(emb)
                        doubled = True
                    h = attn_layer(ch, f"down_attn_{block}")(h, context)
                hs.append(h)
                block += 1
            if level != len(cfg.channel_mult) - 1:
                h = DownsampleHW(ch, dtype=self.dtype, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        ch = mc * cfg.channel_mult[-1]
        h = ResBlock3D(ch, cfg.dropout, dtype=self.dtype,
                       name="mid_res_0")(h, emb, deterministic)
        if not doubled:
            h = tile2(h)
            emb = tile2(emb)
            doubled = True
        h = attn_layer(ch, "mid_attn")(h, context)
        h = ResBlock3D(ch, cfg.dropout, dtype=self.dtype,
                       name="mid_res_1")(h, emb, deterministic)

        # --- decoder ---
        block = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = mc * mult
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                # a skip still at batch K under a doubled h is context-free
                # (recorded before the first cross-attention)
                untiled = skip.shape[0] * 2 == h.shape[0]
                # default OFF since round 4: the split was measured to LOSE
                # 6.9% end-to-end on v5e (ABRESULTS_r04 skip_split_off
                # 0.1610 vs default 0.1506; the seam handling fragments the
                # decoder convs XLA would otherwise fuse+batch at 2K).
                # CFG-dedup and the decomposed upsample from the same
                # family were re-measured as wins and stay on.
                if untiled and skip_split_supported(h.shape[-1],
                                                    skip.shape[-1], ch) \
                        and os.environ.get("COMMONSCENES_SKIP_SPLIT",
                                           "0") == "1":
                    h = ResBlock3D(ch, cfg.dropout, dtype=self.dtype,
                                   name=f"up_res_{block}")(
                        h, emb, deterministic, skip=skip)
                else:
                    if untiled:
                        skip = tile2(skip)
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = ResBlock3D(ch, cfg.dropout, dtype=self.dtype,
                                   name=f"up_res_{block}")(h, emb,
                                                           deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn_layer(ch, f"up_attn_{block}")(h, context)
                if level and i == cfg.num_res_blocks:
                    h = UpsampleHW(ch, dtype=self.dtype, name=f"up_{level}")(h)
                    ds //= 2
                block += 1

        h = GroupNorm(silu=True, eps=1e-5, name="norm_out")(h)
        h = conv3(cfg.out_channels, "conv_out", zero_init=True,
                  dtype=self.dtype)(h)
        return h.astype(jnp.float32)


class ConditionedDenoiser(nn.Module):
    """Conditioning dispatch (reference
    model/networks/diffusion_networks/network.py:20-42): 'crossattn' feeds
    relation tokens to the spatial transformers; 'concat' reshapes the
    relation vector to a [B,16,16,16,Cc] grid concatenated to x_t."""

    cfg: UNetConfig
    conditioning_key: str = "crossattn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 cond: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 cfg_pair: bool = False,
                 inference: bool = False) -> jax.Array:
        if self.conditioning_key == "crossattn":
            ctx = cond  # [B, M, context_dim] (or [2B, ...] when cfg_pair)
            unet_in = x
            if cfg_pair:
                return UNet3D(self.cfg, dtype=self.dtype, name="unet")(
                    unet_in, timesteps, ctx, deterministic, cfg_pair=True,
                    inference=inference)
        elif self.conditioning_key == "concat":
            B, D, H, W, _ = x.shape
            grid = cond.reshape(B, -1, D, H, W)
            grid = jnp.moveaxis(grid, 1, -1)  # [B, D, H, W, Cc]
            unet_in = jnp.concatenate([x, grid.astype(x.dtype)], axis=-1)
            ctx = None
        elif self.conditioning_key in (None, "none"):
            unet_in = x
            ctx = None
        else:
            raise NotImplementedError(self.conditioning_key)
        return UNet3D(self.cfg, dtype=self.dtype, name="unet")(
            unet_in, timesteps, ctx, deterministic, inference=inference)
