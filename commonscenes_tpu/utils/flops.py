"""Analytic FLOP accounting for the benchmark baseline.

The axon PJRT plugin's ``cost_analysis`` under-reports fused-program FLOPs,
so the bench computes workload FLOPs from the architecture directly: conv
contractions, attention matmuls and dense layers of the UNet denoiser and
the VQ-VAE decoder at their configured shapes.
"""

from __future__ import annotations

from typing import Tuple

from commonscenes_tpu.core.config import UNetConfig, VQVAEConfig


def _conv_flops(vox: int, cin: int, cout: int, k: int = 27) -> float:
    return 2.0 * vox * k * cin * cout


def unet_forward_flops(cfg: UNetConfig, batch: int,
                       cfg_pair_base: int = 0,
                       upsample_parity: bool = False,
                       m1_cross: bool = False) -> float:
    """One denoiser forward at [batch, S, S, S, in_channels] where S =
    cfg.image_size; H/W halve per level, depth stays (reference
    openai_model_3d.py:150-158).

    ``cfg_pair_base > 0``: account the CFG-deduped forward (nn/unet3d.py
    cfg_pair) — blocks before the first attention run at ``cfg_pair_base``
    (K) while everything after runs at ``batch`` (2K).

    ``upsample_parity=True`` counts the parity-decomposed upsample conv
    (nn/unet3d.py UpsampleHW: 12 of 27 taps) — the executed program's
    cost; False counts the reference's materialized repeat→3³-conv.

    When ``cfg_pair_base > 0``, decoder blocks whose skip was recorded
    before the first attention run the skip-side norm1/conv1/residual-
    projection once at K (nn/unet3d.py ResBlock3D split form, gated by
    skip_split_supported AND the COMMONSCENES_SKIP_SPLIT env knob — the
    accounting must mirror the runtime gate or executed-FLOP numbers
    drift from the program actually run).
    """
    import os
    from commonscenes_tpu.nn.unet3d import skip_split_supported
    split_on = os.environ.get("COMMONSCENES_SKIP_SPLIT", "0") == "1"
    S = cfg.image_size
    mc = cfg.model_channels
    total = 0.0
    # multiplier bookkeeping for the deduped prefix
    state = {"doubled": cfg_pair_base == 0}

    def scale() -> float:
        if state["doubled"]:
            return 1.0
        return cfg_pair_base / float(batch)

    def mark_doubled():
        state["doubled"] = True

    def res_block(vox, cin, cout):
        f = _conv_flops(vox, cin, cout) + _conv_flops(vox, cout, cout)
        if cin != cout:
            f += _conv_flops(vox, cin, cout, k=1)
        # time-emb projection is negligible
        return f

    def attn_block(vox, ch):
        heads = cfg.num_heads
        inner = ch
        f = 2.0 * vox * ch * inner          # proj_in (1x1)
        # per-transformer-block terms repeat transformer_depth times
        # (SpatialTransformer3D loops `for _ in range(depth)`)
        b = 3 * 2.0 * vox * inner * inner   # self qkv
        b += 2 * 2.0 * vox * vox * inner    # self attn matmuls
        b += 2.0 * vox * inner * inner      # self out
        ctx = cfg.context_dim or inner
        if m1_cross:
            # executed single-token shortcut (nn/attention.py M==1 path):
            # softmax over one key is identically 1, so cross-attention is
            # a value broadcast — only the v projection and a one-token
            # out-projection run; q/k/attn matmuls are dead compute
            b += 2.0 * 1 * ctx * inner      # cross v (1 token)
            b += 2.0 * 1 * inner * inner    # cross out (1 token)
        else:
            b += 2 * 2.0 * 1 * ctx * inner      # cross k/v (1 token)
            b += 2.0 * vox * inner * inner      # cross q
            b += 2 * 2.0 * vox * 1 * inner      # cross attn matmuls
            b += 2.0 * vox * inner * inner      # cross out
        b += 2 * 2.0 * vox * inner * 4 * inner * 1.5  # GEGLU FF
        f += b * cfg.transformer_depth
        f += 2.0 * vox * inner * ch         # proj_out
        return f

    vox = S * S * S
    ch = mc
    total += _conv_flops(vox, cfg.in_channels, mc) * scale()
    ds = 1
    # (vox, ch, shared): shared marks skips recorded before the first
    # attention — identical across CFG halves, eligible for the decoder
    # skip split
    skips = [(vox, mc, not state["doubled"])]
    # encoder
    for level, mult in enumerate(cfg.channel_mult):
        cout = mc * mult
        for _ in range(cfg.num_res_blocks):
            total += res_block(vox, ch, cout) * scale()
            ch = cout
            if ds in cfg.attention_resolutions:
                mark_doubled()
                total += attn_block(vox, ch)
            skips.append((vox, ch, not state["doubled"]))
        if level != len(cfg.channel_mult) - 1:
            total += _conv_flops(vox // 4, ch, ch) * scale()  # strided (1,2,2)
            vox //= 4
            ds *= 2
            skips.append((vox, ch, not state["doubled"]))
    # middle
    total += res_block(vox, ch, ch) * scale()
    mark_doubled()
    total += res_block(vox, ch, ch) + attn_block(vox, ch)
    # decoder
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        cout = mc * mult
        for i in range(cfg.num_res_blocks + 1):
            svox, sch, shared = skips.pop()
            if shared and split_on and skip_split_supported(ch, sch, cout):
                from commonscenes_tpu.nn.unet3d import _gn_groups
                sk = cfg_pair_base / float(batch)
                in_ch = ch + sch
                gsz = in_ch // _gn_groups(in_ch)
                a_h = ch % gsz
                # pure-skip channels convolve at K; a seam-straddling
                # group's skip channels stay at 2K (span case)
                pure_sk = sch if a_h == 0 else sch - (gsz - a_h)
                f = _conv_flops(vox, in_ch - pure_sk, cout) \
                    + _conv_flops(vox, pure_sk, cout) * sk   # conv1 split
                f += _conv_flops(vox, cout, cout)            # conv2
                f += _conv_flops(vox, ch, cout, k=1) \
                    + _conv_flops(vox, sch, cout, k=1) * sk  # skip proj split
                total += f
            else:
                total += res_block(vox, ch + sch, cout)
            ch = cout
            if ds in cfg.attention_resolutions:
                total += attn_block(vox, ch)
            if level and i == cfg.num_res_blocks:
                vox *= 4
                total += _conv_flops(vox, ch, ch) * (
                    12.0 / 27.0 if upsample_parity else 1.0)
                ds //= 2
    total += _conv_flops(vox, ch, cfg.out_channels)
    return total * batch


def vqvae_decode_flops(cfg: VQVAEConfig, batch: int) -> float:
    ch = cfg.ch
    z_sp = cfg.z_spatial
    vox = z_sp ** 3
    block_in = ch * cfg.ch_mult[-1]
    total = _conv_flops(vox, cfg.embed_dim, cfg.z_channels, k=1)
    total += _conv_flops(vox, cfg.z_channels, block_in)

    def res(vox, cin, cout):
        f = _conv_flops(vox, cin, cout) + _conv_flops(vox, cout, cout)
        if cin != cout:
            f += _conv_flops(vox, cin, cout, k=1)
        return f

    # mid: res, attn, res
    total += 2 * res(vox, block_in, block_in)
    total += 4 * 2.0 * vox * block_in * block_in + 2 * 2.0 * vox * vox * block_in
    cin = block_in
    for lvl in reversed(range(len(cfg.ch_mult))):
        cout = ch * cfg.ch_mult[lvl]
        for _ in range(cfg.num_res_blocks):
            total += res(vox, cin, cout)
            cin = cout
        if lvl != 0:
            vox *= 8
            total += _conv_flops(vox, cin, cin)
    total += _conv_flops(vox, cin, cfg.out_ch)
    return total * batch


def sample_flops(unet_cfg: UNetConfig, vq_cfg: VQVAEConfig, num_objs: int,
                 ddim_steps: int, cfg_scale_batched: bool = True,
                 cfg_dedup: bool = False,
                 upsample_parity: bool = False,
                 m1_cross: bool = False) -> float:
    """FLOPs to generate shapes for one scene's objects with DDIM + CFG.

    ``cfg_dedup=True`` counts the ACTUAL executed FLOPs of the CFG-deduped
    forward (shared context-free prefix); False counts the reference's naive
    2×-batched program (the right denominator for the A100 baseline).
    ``m1_cross=True`` additionally counts the executed single-relation-token
    cross-attention shortcut (nn/attention.py M==1 path) instead of the
    full cross-attention the reference runs — set it whenever cfg_dedup is
    set, for the same honest-MFU reason."""
    b = num_objs * (2 if cfg_scale_batched else 1)
    base = num_objs if (cfg_dedup and cfg_scale_batched) else 0
    return (ddim_steps * unet_forward_flops(unet_cfg, b, cfg_pair_base=base,
                                            upsample_parity=upsample_parity,
                                            m1_cross=m1_cross)
            + vqvae_decode_flops(vq_cfg, num_objs))
