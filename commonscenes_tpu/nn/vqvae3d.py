"""3D VQ-VAE over truncated-SDF grids (first stage of the shape branch).

Capability parity with the reference VQVAE
(model/networks/vqvae_networks/network.py:51-140, vqvae_modules.py,
quantizer.py): taming-lineage Encoder3D/Decoder3D with swish res blocks,
GELU heads, full self-attention at the bottleneck, asymmetric-padded
strided-conv downsampling over all three spatial dims, and an L2
vector-quantizer with straight-through gradients (beta=1, legacy=False
ordering).

TPU redesign: NDHWC channels-last layout, fp32 group norms with bf16-capable
convs, and the codebook lookup as one [B·16³, 8192] matmul on the MXU using
the ‖z‖² + ‖e‖² − 2·z·e expansion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from commonscenes_tpu.core.config import VQVAEConfig
from commonscenes_tpu.nn.attention import GroupNorm


def _vq_groups(C: int) -> int:
    """Reference Normalize group rule (vqvae_modules.py:13-21): 32 groups,
    or C//4 when C <= 32 (tiny widths)."""
    return max(C // 4, 1) if C <= 32 else 32


def swish(x):
    return x * nn.sigmoid(x)


def conv3(features, name, strides=(1, 1, 1), padding=1, dtype=None):
    from commonscenes_tpu.nn.conv3d import Conv3D
    return Conv3D(features, kernel_size=(3, 3, 3), strides=strides,
                  padding=padding, dtype=dtype, name=name)


class VQResBlock(nn.Module):
    """GN→swish→conv ×2 with 1×1 nin shortcut (vqvae_modules.py:64-123)."""

    out_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm(num_groups=_vq_groups(in_ch), silu=True,
                      name="norm1")(x)   # swish ≡ SiLU, fused
        h = conv3(self.out_channels, "conv1", dtype=self.dtype)(h)
        h = GroupNorm(num_groups=_vq_groups(self.out_channels),
                      silu=True, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3(self.out_channels, "conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                        dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VQAttnBlock(nn.Module):
    """Single-head full self-attention over all voxels
    (vqvae_modules.py:126-178)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, D, H, W, C = x.shape
        h = GroupNorm(num_groups=_vq_groups(C), name="norm")(x)
        q = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="q")(h).reshape(B, -1, C)
        k = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="k")(h).reshape(B, -1, C)
        v = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="v")(h).reshape(B, -1, C)

        from commonscenes_tpu.ops import flash_attention as fa
        N = q.shape[1]
        if fa.on_tpu() and fa.self_attention_supported(N, C):
            out = fa.flash_self_attention(q[:, :, None, :], k[:, :, None, :],
                                          v[:, :, None, :],
                                          scale=C ** -0.5)[:, :, 0, :]
        else:
            sim = jnp.einsum("bnc,bmc->bnm", q, k,
                             preferred_element_type=jnp.float32) * (C ** -0.5)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bnm,bmc->bnc", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(B, D, H, W, C).astype(x.dtype)
        out = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class DownsampleAsym(nn.Module):
    """Pad (0,1) on each spatial dim, then stride-2 VALID conv
    (vqvae_modules.py:42-61)."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from commonscenes_tpu.nn.conv3d import Conv3D
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        return Conv3D(self.channels, (3, 3, 3), strides=(2, 2, 2),
                      padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample3D(nn.Module):
    """Nearest ×2 on all three spatial dims, then conv."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return conv3(self.channels, "conv", dtype=self.dtype)(x)


class Encoder3D(nn.Module):
    cfg: VQVAEConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = conv3(cfg.ch, "conv_in", dtype=self.dtype)(x)
        num_res = len(cfg.ch_mult)
        curr_res = cfg.resolution
        for lvl, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for b in range(cfg.num_res_blocks):
                h = VQResBlock(ch, cfg.dropout, dtype=self.dtype,
                               name=f"down_{lvl}_block_{b}")(h, deterministic)
                if curr_res in tuple(cfg.attn_resolutions):
                    # per-level attention (vqvae_modules.py:225-227,272-273)
                    h = VQAttnBlock(dtype=self.dtype,
                                    name=f"down_{lvl}_attn_{b}")(h)
            if lvl != num_res - 1:
                h = DownsampleAsym(ch, dtype=self.dtype, name=f"down_{lvl}_ds")(h)
                curr_res //= 2
        h = VQResBlock(h.shape[-1], cfg.dropout, dtype=self.dtype,
                       name="mid_block_1")(h, deterministic)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = VQResBlock(h.shape[-1], cfg.dropout, dtype=self.dtype,
                       name="mid_block_2")(h, deterministic)
        h = GroupNorm(num_groups=_vq_groups(h.shape[-1]), name="norm_out")(h)
        h = jax.nn.gelu(h, approximate=False)   # exact GELU head, torch nn.GELU (vqvae_modules.py:199-200)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv3(z_ch, "conv_out", dtype=self.dtype)(h)


class Decoder3D(nn.Module):
    cfg: VQVAEConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = conv3(block_in, "conv_in", dtype=self.dtype)(z)
        h = VQResBlock(block_in, cfg.dropout, dtype=self.dtype,
                       name="mid_block_1")(h, deterministic)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = VQResBlock(block_in, cfg.dropout, dtype=self.dtype,
                       name="mid_block_2")(h, deterministic)
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        for lvl in reversed(range(num_res)):
            ch = cfg.ch * cfg.ch_mult[lvl]
            for b in range(cfg.num_res_blocks):
                h = VQResBlock(ch, cfg.dropout, dtype=self.dtype,
                               name=f"up_{lvl}_block_{b}")(h, deterministic)
                if curr_res in tuple(cfg.attn_resolutions):
                    # per-level attention (vqvae_modules.py:348-360,395-396)
                    h = VQAttnBlock(dtype=self.dtype,
                                    name=f"up_{lvl}_attn_{b}")(h)
            if lvl != 0:
                h = Upsample3D(ch, dtype=self.dtype, name=f"up_{lvl}_us")(h)
                curr_res *= 2
        h = GroupNorm(num_groups=_vq_groups(h.shape[-1]), name="norm_out")(h)
        h = jax.nn.gelu(h, approximate=False)
        return conv3(cfg.out_ch, "conv_out", dtype=self.dtype)(h)


class VectorQuantizer(nn.Module):
    """L2 nearest-codebook lookup + straight-through (quantizer.py:68-119).

    The argmin distance matrix is computed as one [M, n_embed] MXU matmul.
    """

    n_embed: int
    embed_dim: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """z: [B, D, H, W, C] → (z_q, codebook_loss, indices [B,D,H,W])."""
        emb = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        # torch nn.Embedding init in reference is U(-1/n, 1/n); flax uniform
        # is U(0, scale) so shift to match the symmetric range.
        emb_c = emb - 1.0 / self.n_embed

        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             + jnp.sum(emb_c ** 2, axis=1)[None, :]
             - 2.0 * flat @ emb_c.T)
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(emb_c, idx, axis=0).reshape(z.shape).astype(z.dtype)

        zf = z.astype(jnp.float32)
        zqf = z_q.astype(jnp.float32)
        # legacy=False ordering (quantizer.py:91-93)
        loss = (self.beta * jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2)
                + jnp.mean((zqf - jax.lax.stop_gradient(zf)) ** 2))
        z_q = z + jax.lax.stop_gradient(z_q - z)   # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])

    def lookup(self, indices: jax.Array) -> jax.Array:
        emb = self.get_variable("params", "embedding") - 1.0 / self.n_embed
        return jnp.take(emb, indices, axis=0)


class VQVAE3D(nn.Module):
    """encode / decode / quantize with the reference's method surface:
    ``encode_no_quant`` feeds diffusion training, ``decode_no_quant``
    (quantize → post_quant → decode) decodes DDIM samples
    (network.py:84-103)."""

    cfg: VQVAEConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = Encoder3D(self.cfg, dtype=self.dtype)
        self.decoder = Decoder3D(self.cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim,
                                        self.cfg.beta)
        self.quant_conv = nn.Conv(self.cfg.embed_dim, (1, 1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_no_quant(self, x: jax.Array) -> jax.Array:
        """SDF grid [B,R,R,R,1] → continuous latent [B,r,r,r,embed_dim]."""
        h = self.encoder(x)
        return self.quant_conv(h)

    def encode(self, x: jax.Array):
        h = self.encode_no_quant(x)
        return self.quantize(h)

    def decode(self, quant: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(quant))

    def decode_no_quant(self, h: jax.Array,
                        force_not_quantize: bool = False) -> jax.Array:
        if force_not_quantize:
            quant = h
        else:
            quant, _, _ = self.quantize(h)
        return self.decode(quant)

    def __call__(self, x: jax.Array):
        """Full autoencode: returns (reconstruction, codebook_loss)."""
        quant, emb_loss, _ = self.encode(x)
        return self.decode(quant), emb_loss
