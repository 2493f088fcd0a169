"""Configuration tree for commonscenes_tpu.

Mirrors the reference's OmegaConf YAML surface (config/v2_full.yaml →
config/sdfusion-txt2shape.yaml + config/vqvae_snet.yaml, loaded at
model/VAEGAN_V2FULL.py:92 and model/sdfusion_txt2shape_model.py:64-65) as
plain frozen dataclasses so every hyperparameter is a static jit constant.

YAML files with the same keys as the reference load directly via
``load_full_config`` / the per-section ``from_dict`` helpers.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import yaml


def _filter_kwargs(cls, d: Mapping[str, Any]) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


# ---------------------------------------------------------------------------
# VQ-VAE (first stage) — reference config/vqvae_snet.yaml
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VQVAEConfig:
    """3D VQ-VAE over truncated-SDF grids (reference
    model/networks/vqvae_networks/network.py:51-140)."""

    embed_dim: int = 3          # codebook vector dim
    n_embed: int = 8192         # codebook size
    z_channels: int = 3
    resolution: int = 64        # input SDF grid res
    in_channels: int = 1
    out_ch: int = 1
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4)   # num_down = len(ch_mult) - 1
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    double_z: bool = False
    beta: float = 1.0           # commitment weight (legacy=False ordering)

    @property
    def num_down(self) -> int:
        return len(self.ch_mult) - 1

    @property
    def z_spatial(self) -> int:
        return self.resolution // (2 ** self.num_down)

    @property
    def z_shape(self) -> tuple:
        # NDHWC latent shape (spatial, spatial, spatial, z_channels)
        s = self.z_spatial
        return (s, s, s, self.z_channels)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "VQVAEConfig":
        # Accept either our flat layout or the reference's nested
        # model.params.{embed_dim,n_embed,ddconfig...} layout.
        if "model" in d:
            p = d["model"]["params"]
            dd = dict(p.get("ddconfig", {}))
            flat = {"embed_dim": p.get("embed_dim", 3), "n_embed": p.get("n_embed", 8192)}
            flat.update(dd)
            d = flat
        d = dict(d)
        for k in ("ch_mult", "attn_resolutions"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**_filter_kwargs(cls, d))


# ---------------------------------------------------------------------------
# Diffusion UNet — reference config/sdfusion-txt2shape.yaml unet.params
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    """3D latent-denoiser UNet (reference
    model/networks/diffusion_networks/openai_model_3d.py:452-789).

    Note the reference's dims=3 down/upsampling only halves/doubles the inner
    two spatial dims (openai_model_3d.py:150-158, 188) — depth stays at
    ``image_size``. We reproduce that resolution schedule.
    """

    image_size: int = 16
    in_channels: int = 3
    out_channels: int = 3
    model_channels: int = 224
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2)  # downsample factors with attn
    channel_mult: Sequence[int] = (1, 2, 3)
    num_heads: int = 8
    dropout: float = 0.0
    conv_resample: bool = True
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: int = 1280
    use_checkpoint: bool = True   # jax.checkpoint on res/attn blocks

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "UNetConfig":
        if "unet" in d:
            d = d["unet"]["params"]
        d = dict(d)
        for k in ("attention_resolutions", "channel_mult"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class DiffusionConfig:
    """Noise schedule + sampling (reference
    model/sdfusion_txt2shape_model.py:159-237, config/sdfusion-txt2shape.yaml
    model.params)."""

    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.012
    cosine_s: float = 8e-3
    parameterization: str = "eps"
    conditioning_key: str = "crossattn"   # 'crossattn' | 'concat'
    ddim_steps: int = 100
    ddim_eta: float = 0.0
    uc_scale: float = 3.0                 # classifier-free guidance scale
    sample_minibatch: int = 7             # objects per DDIM call at eval
    # loss weights (ddpm.py lineage; sdfusion_txt2shape_model.py:166-170)
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "DiffusionConfig":
        if "model" in d:
            d = d["model"]["params"]
        return cls(**_filter_kwargs(cls, d))


# ---------------------------------------------------------------------------
# Layout branch (scene-graph VAE) — reference model/VAEGAN_V2FULL.py:22-174
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LayoutConfig:
    """Triplet-GCN layout VAE dims.

    The reference picks these in model/VAE.py:30-64: embedding_dim=64,
    decoder_cat=True, batch-norm MLPs, 5 GCN layers for every variant.
    """

    embedding_dim: int = 64
    gconv_num_layers: int = 5
    gconv_pooling: str = "avg"           # 'sum' | 'avg' | 'wAvg'
    mlp_normalization: str = "batch"     # 'none' | 'batch'
    residual: bool = False
    decoder_cat: bool = True
    use_angles: bool = True
    num_angle_bins: int = 24
    num_box_params: int = 6
    use_clip: bool = True                # +512-dim CLIP features (v2_*)
    clip_dim: int = 512
    use_e2: bool = True                  # relation encoder feeding diffusion
    replace_latent: bool = True
    with_changes: bool = True
    # v1_full (Graph-to-3D) extras (VAEGAN_V1FULL.py:13-31 call site
    # model/VAE.py:46-51): shared-GCN depth + DeepSDF code width
    gconv_num_shared_layers: int = 5
    shape_input_dim: int = 256
    # diffusion conditioning token width (rel_mlp output;
    # VAEGAN_V2FULL.py:152-155): 1280 for crossattn, 4096 for concat
    rel_hidden_crossattn: int = 960
    rel_out_crossattn: int = 1280
    rel_hidden_concat: int = 1280
    rel_out_concat: int = 4096

    @property
    def gconv_dim(self) -> int:
        return self.embedding_dim

    @property
    def gconv_hidden_dim(self) -> int:
        return self.embedding_dim * 4

    @property
    def add_dim(self) -> int:
        return self.clip_dim if self.use_clip else 0

    @property
    def box_embedding_dim(self) -> int:
        if self.use_angles:
            return int(self.embedding_dim * 3 / 4)
        return self.embedding_dim

    @property
    def angle_embedding_dim(self) -> int:
        return int(self.embedding_dim / 4)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "LayoutConfig":
        return cls(**_filter_kwargs(cls, d))


# ---------------------------------------------------------------------------
# Batching / padding geometry for static shapes
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BatchConfig:
    """Static padding geometry replacing the reference's ragged collate
    (dataset/threedfront_dataset.py:693-828)."""

    batch_size: int = 8          # scenes per step (layout branch)
    max_objs: int = 16           # padded objects per scene (incl. _scene_ root)
    max_triples: int = 128       # padded triples per scene
    diffusion_bs: int = 4        # SDF objects per step (shape branch)
    sdf_res: int = 64
    trunc_thres: float = 0.2

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "BatchConfig":
        return cls(**_filter_kwargs(cls, d))


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference model/VAEGAN_V2FULL.py:620-669,
    scripts/train_3dfront.py)."""

    lr: float = 1e-4
    aux_lr: float = 1e-4                  # discriminator lr
    # step-wise lr multipliers: 1e-4 → 5e-5@20k → 1e-5@60k → 5e-6@100k
    lr_milestones: Sequence[int] = (20000, 60000, 100000)
    lr_factors: Sequence[float] = (1.0, 0.5, 0.1, 0.05)
    kl_weight: float = 0.1
    shape_loss_weight: float = 100.0      # train_3dfront.py:389
    weight_d_box: float = 0.1             # GAN generator weight
    gan_gamma: float = 0.1                # gradient-penalty weight
    grad_clip_norm: float = 5.0
    nepoch: int = 200
    save_every_epochs: int = 15
    seed: int = 111

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TrainConfig":
        d = dict(d)
        for k in ("lr_milestones", "lr_factors"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD execution."""

    data_axis: str = "data"
    num_devices: int = 0    # 0 → use all available

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "MeshConfig":
        return cls(**_filter_kwargs(cls, d))


# ---------------------------------------------------------------------------
# Full config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FullConfig:
    network_type: str = "v2_full"   # v1_box | v2_box | v1_full | v2_full
    layout: LayoutConfig = field(default_factory=LayoutConfig)
    vqvae: VQVAEConfig = field(default_factory=VQVAEConfig)
    unet: UNetConfig = field(default_factory=UNetConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    batch: BatchConfig = field(default_factory=BatchConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    compute_dtype: str = "bfloat16"

    def replace(self, **kw) -> "FullConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "FullConfig":
        kw: dict = {}
        if "network_type" in d:
            kw["network_type"] = d["network_type"]
        if "compute_dtype" in d:
            kw["compute_dtype"] = d["compute_dtype"]
        sections = {
            "layout": LayoutConfig,
            "vqvae": VQVAEConfig,
            "unet": UNetConfig,
            "diffusion": DiffusionConfig,
            "batch": BatchConfig,
            "train": TrainConfig,
            "mesh": MeshConfig,
        }
        for name, scls in sections.items():
            if name in d:
                kw[name] = scls.from_dict(d[name])
        return cls(**kw)


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def load_full_config(path: str | None = None, **overrides) -> FullConfig:
    """Load a FullConfig.

    Accepts our native layout (sections at top level) or the reference's
    v2_full.yaml-style layout (hyper/network/dataset sections with
    df_cfg/vq_cfg sub-file pointers, config/v2_full.yaml).
    """
    if path is None:
        cfg = FullConfig()
    else:
        d = load_yaml(path)
        if "hyper" in d or "network" in d:
            cfg = _from_reference_layout(d, os.path.dirname(os.path.abspath(path)))
        else:
            cfg = FullConfig.from_dict(d)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def _from_reference_layout(d: Mapping[str, Any], base_dir: str) -> FullConfig:
    """Interpret the reference's config/v2_full.yaml tree."""
    kw: dict = {}
    net = d.get("network", {})
    hyper = d.get("hyper", {})
    ds = d.get("dataset", {})

    batch_kw = {}
    if hyper.get("batch_size") is not None:
        batch_kw["diffusion_bs"] = int(hyper["batch_size"])
    if ds.get("res") is not None:
        batch_kw["sdf_res"] = int(ds["res"])
    if ds.get("trunc_thres") is not None:
        batch_kw["trunc_thres"] = float(ds["trunc_thres"])
    kw["batch"] = BatchConfig(**batch_kw)

    diff_kw: dict = {}
    for yk, ck in (("ddim_steps", "ddim_steps"), ("ddim_eta", "ddim_eta"), ("uc_scale", "uc_scale")):
        if net.get(yk) is not None:
            diff_kw[ck] = net[yk]
    df_cfg_path = net.get("df_cfg")
    unet_cfg = UNetConfig()
    if df_cfg_path:
        p = df_cfg_path if os.path.isabs(df_cfg_path) else os.path.join(base_dir, df_cfg_path)
        if os.path.exists(p):
            df = load_yaml(p)
            unet_cfg = UNetConfig.from_dict(df)
            mp = df.get("model", {}).get("params", {})
            for yk in ("timesteps", "linear_start", "linear_end", "conditioning_key"):
                if yk in mp:
                    diff_kw[yk] = mp[yk]
    kw["unet"] = unet_cfg
    kw["diffusion"] = DiffusionConfig(**_filter_kwargs(DiffusionConfig, diff_kw))

    vq_cfg_path = net.get("vq_cfg")
    if vq_cfg_path:
        p = vq_cfg_path if os.path.isabs(vq_cfg_path) else os.path.join(base_dir, vq_cfg_path)
        if os.path.exists(p):
            kw["vqvae"] = VQVAEConfig.from_dict(load_yaml(p))

    return FullConfig(**kw)
