"""Uniform facade over the four network types.

Capability parity with the reference ``VAE`` class (model/VAE.py:18-341):
one constructor dispatching on ``network_type`` ∈ {v1_box, v2_box, v1_full,
v2_full}, with a common surface for training forward, sampling, latent
statistics and checkpoint I/O. The reference's per-variant constructor
arguments (model/VAE.py:30-64: embedding_dim=64, decoder_cat=True,
batch-norm MLPs, 5 GCN layers; v1_full uses embedding_dim=128) are encoded
here as config presets.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Dict, Optional

import jax
import numpy as np

from commonscenes_tpu.core.config import FullConfig, LayoutConfig
from commonscenes_tpu.core.graph import GraphBatch
from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
from commonscenes_tpu.models.layout_vae import LayoutVAE
from commonscenes_tpu.models.v1_full import V1FullVAE


def preset_layout_config(network_type: str, base: LayoutConfig) -> LayoutConfig:
    """Reference per-variant dims (model/VAE.py:30-64)."""
    if network_type == "v1_box":
        return replace(base, use_clip=False, use_e2=False)
    if network_type == "v2_box":
        return replace(base, use_clip=True, use_e2=False)
    if network_type == "v2_full":
        return replace(base, use_clip=True)
    if network_type == "v1_full":
        return replace(base, use_clip=False, embedding_dim=128)
    raise ValueError(network_type)


class SceneVAE:
    """Constructor-dispatch facade (the reference ``VAE`` equivalent)."""

    def __init__(self, cfg: FullConfig, num_obj_classes: int,
                 num_pred_classes: int, dtype=None):
        self.type_ = cfg.network_type
        cfg = cfg.replace(layout=preset_layout_config(cfg.network_type,
                                                      cfg.layout))
        self.cfg = cfg
        self.num_obj_classes = num_obj_classes
        self.num_pred_classes = num_pred_classes

        if self.type_ in ("v1_box", "v2_box"):
            self.layout = LayoutVAE(cfg.layout, num_obj_classes,
                                    num_pred_classes,
                                    build_rel_encoder=False, dtype=dtype)
            self.model = None
        elif self.type_ == "v2_full":
            self.model = CommonScenesV2Full(cfg, num_obj_classes,
                                            num_pred_classes, dtype=dtype)
            self.layout = self.model.layout
        elif self.type_ == "v1_full":
            self.v1 = V1FullVAE(
                num_obj_classes=num_obj_classes,
                num_pred_classes=num_pred_classes,
                embedding_dim=cfg.layout.embedding_dim,
                gconv_pooling=cfg.layout.gconv_pooling,
                mlp_normalization=cfg.layout.mlp_normalization,
                residual=cfg.layout.residual,
                use_angles=cfg.layout.use_angles,
                num_box_params=cfg.layout.num_box_params,
                replace_latent=cfg.layout.replace_latent,
                dtype=dtype)
            self.model = None
        else:
            raise ValueError(self.type_)

    # ------------------------------------------------------------------

    def init(self, key: jax.Array, batch: GraphBatch,
             shapes_gt=None) -> Dict[str, Any]:
        if self.type_ == "v2_full":
            return self.model.init(key, batch)
        if self.type_ == "v1_full":
            import jax.numpy as jnp
            B, N = batch.dec.objs.shape
            if shapes_gt is None:
                shapes_gt = jnp.zeros((B * N, 256))
            return {"layout": self.v1.init(
                {"params": key}, batch.enc, batch.dec, shapes_gt,
                batch.node_new, batch.node_changed, jax.random.PRNGKey(0),
                train=False)}
        return {"layout": self.layout.init(
            {"params": key}, batch.enc, batch.dec, batch.node_new,
            batch.node_changed, jax.random.PRNGKey(0), train=False)}

    def forward_mani(self, variables: Dict[str, Any], batch: GraphBatch,
                     key: jax.Array, train: bool = True,
                     shapes_gt=None):
        """Training forward — the reference forward_mani (VAE.py:69-101)."""
        if self.type_ == "v2_full":
            return self.model.train_forward(variables, batch, key, train=train)
        # mutable is a list either way, so flax returns (out, updates) in
        # both modes; normalize the updates tree to the v2_full shape
        # ({"layout": ...}) so facade callers are variant-agnostic
        mutable = ["batch_stats"] if train else []
        if self.type_ == "v1_full":
            out, ups = self.v1.apply(
                variables["layout"], batch.enc, batch.dec, shapes_gt,
                batch.node_new, batch.node_changed, key, train=train,
                mutable=mutable)
        else:
            out, ups = self.layout.apply(
                variables["layout"], batch.enc, batch.dec, batch.node_new,
                batch.node_changed, key, train=train, mutable=mutable)
        return out, ({"layout": ups} if train else {})

    def encode_means(self, variables, enc, shapes_gt=None):
        """Latent means for train-set statistics (VAE.py:160-191)."""
        if self.type_ == "v1_full":
            mu, _ = self.v1.apply(variables["layout"], enc, shapes_gt,
                                  train=False, method=V1FullVAE.encode)
        else:
            mu, _ = self.layout.apply(variables["layout"], enc, train=False,
                                      method=LayoutVAE.encode)
        mask = np.asarray(enc.obj_mask).reshape(-1) > 0
        return np.asarray(mu)[mask], mask

    def sample_boxes(self, variables, dec, mean_est, cov_chol, key):
        """sampleBoxes equivalent (VAEGAN_V2FULL.py:593-598): z from the fit
        Gaussian → decode boxes/angles."""
        import jax.numpy as jnp
        B, N = dec.objs.shape
        eps = jax.random.normal(key, (B * N, mean_est.shape[0]))
        z = jnp.asarray(mean_est)[None] + eps @ jnp.asarray(cov_chol).T
        if self.type_ == "v1_full":
            return self.v1.apply(variables["layout"], z, dec, train=False,
                                 method=V1FullVAE.decode)
        return self.layout.apply(variables["layout"], z, dec, train=False,
                                 method=LayoutVAE.decode)
