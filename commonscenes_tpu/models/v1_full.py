"""Graph-to-3D baseline (v1_full): joint box + DeepSDF-latent shape VAE.

Capability parity with reference model/VAEGAN_V1FULL.py (dual box/shape
encoders :190-256, shared GCN ``gconv_net_shared`` with distribution_before
:217-236, manipulation network over 2·ed latents :259-270, decoder with
per-branch GCNs and a 256-d ``shape_net`` DeepSDF-latent head :273-306) and
the nearest-latent shape retrieval of model/VAE.py:296-319.

No CLIP features in this variant; dims follow the reference call site
(model/VAE.py:46-51): embedding_dim=128, decoder_cat=True, batch-norm MLPs,
5 enc + 5 shared layers, shape_input_dim=256.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from commonscenes_tpu.core.graph import SceneView, flatten_view
from commonscenes_tpu.nn.gcn import GraphTripleConvNet
from commonscenes_tpu.nn.mlp import MLP


class V1FullVAE(nn.Module):
    num_obj_classes: int
    num_pred_classes: int
    embedding_dim: int = 128
    gconv_num_layers: int = 5
    gconv_num_shared_layers: int = 5
    gconv_pooling: str = "avg"
    mlp_normalization: str = "batch"
    residual: bool = False
    use_angles: bool = True
    num_angle_bins: int = 24
    num_box_params: int = 6
    shape_input_dim: int = 256
    replace_latent: bool = True
    dtype: Optional[jnp.dtype] = None

    @property
    def box_embedding_dim(self) -> int:
        return int(self.embedding_dim * 3 / 4) if self.use_angles \
            else self.embedding_dim

    @property
    def angle_embedding_dim(self) -> int:
        return int(self.embedding_dim / 4)

    def setup(self):
        ed = self.embedding_dim
        gh = ed * 4
        bn = self.mlp_normalization

        self.obj_embed_ec_box = nn.Embed(self.num_obj_classes + 1, ed)
        self.obj_embed_ec_shape = nn.Embed(self.num_obj_classes + 1, ed)
        self.pred_embed_ec_box = nn.Embed(self.num_pred_classes, 2 * ed)
        self.pred_embed_ec_shape = nn.Embed(self.num_pred_classes, 2 * ed)
        self.obj_embed_dc_box = nn.Embed(self.num_obj_classes + 1, 2 * ed)
        self.obj_embed_dc_man = nn.Embed(self.num_obj_classes + 1, 2 * ed)
        self.obj_embed_dc_shape = nn.Embed(self.num_obj_classes + 1, 2 * ed)
        self.pred_embed_dc_box = nn.Embed(self.num_pred_classes, 4 * ed)
        self.pred_embed_dc_shape = nn.Embed(self.num_pred_classes, 4 * ed)
        self.pred_embed_man_dc = nn.Embed(self.num_pred_classes, 6 * ed)

        self.box_embed = nn.Dense(self.box_embedding_dim, dtype=self.dtype)
        self.shape_embed = nn.Dense(ed, dtype=self.dtype)
        if self.use_angles:
            self.angle_embed = nn.Embed(self.num_angle_bins,
                                        self.angle_embedding_dim)

        def head(dims, norelu=True):
            return MLP(dims, batch_norm=bn, final_nonlinearity=not norelu,
                       dtype=self.dtype)

        self.box_mean_var = head((gh, 2 * ed), norelu=False)
        self.box_mean = head((self.box_embedding_dim,))
        self.box_var = head((self.box_embedding_dim,))
        self.shape_mean_var = head((gh, 2 * ed), norelu=False)
        self.shape_mean = head((ed,))
        self.shape_var = head((ed,))
        if self.use_angles:
            self.angle_mean_var = head((gh, 2 * ed), norelu=False)
            self.angle_mean = head((self.angle_embedding_dim,))
            self.angle_var = head((self.angle_embedding_dim,))

        common = dict(hidden_dim=gh, pooling=self.gconv_pooling,
                      mlp_normalization=bn, residual=self.residual,
                      dtype=self.dtype)
        self.gconv_ec_box = GraphTripleConvNet(
            input_dim_obj=2 * ed, input_dim_pred=2 * ed,
            num_layers=self.gconv_num_layers, **common)
        self.gconv_ec_shape = GraphTripleConvNet(
            input_dim_obj=2 * ed, input_dim_pred=2 * ed,
            num_layers=self.gconv_num_layers, **common)
        self.gconv_shared = GraphTripleConvNet(
            input_dim_obj=gh, input_dim_pred=gh,
            num_layers=self.gconv_num_shared_layers, **common)
        self.gconv_dec_box = GraphTripleConvNet(
            input_dim_obj=4 * ed, input_dim_pred=4 * ed,
            num_layers=self.gconv_num_layers, **common)
        self.gconv_dec_shape = GraphTripleConvNet(
            input_dim_obj=4 * ed, input_dim_pred=4 * ed,
            num_layers=self.gconv_num_layers, **common)
        self.gconv_manipulation = GraphTripleConvNet(
            input_dim_obj=6 * ed, input_dim_pred=6 * ed,
            num_layers=self.gconv_num_layers, output_dim=2 * ed,
            hidden_dim=gh * 2, pooling=self.gconv_pooling,
            mlp_normalization=bn, residual=self.residual, dtype=self.dtype)

        self.box_net = head((gh, self.num_box_params))
        self.shape_net = head((gh, self.shape_input_dim))
        if self.use_angles:
            self.angle_net = head((gh, self.num_angle_bins))

    # ------------------------------------------------------------------

    def encode(self, view: SceneView, shapes_gt: jax.Array,
               train: bool = False):
        """shapes_gt [B·N, 256] DeepSDF codes → (mu, logvar) of width
        (box_emb [+angle_emb]) + ed."""
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        boxes = view.boxes.reshape(-1, view.boxes.shape[-1])

        ov_box = jnp.concatenate(
            [self.obj_embed_ec_box(objs), self.box_embed(boxes)] +
            ([self.angle_embed(view.angles.reshape(-1))] if self.use_angles else []),
            axis=1) * obj_mask[:, None]
        ov_shape = jnp.concatenate(
            [self.obj_embed_ec_shape(objs), self.shape_embed(shapes_gt)],
            axis=1) * obj_mask[:, None]

        pv_box = self.pred_embed_ec_box(predicates)
        pv_shape = self.pred_embed_ec_shape(predicates)

        ov_box, pv_box = self.gconv_ec_box(ov_box, pv_box, edges, obj_mask,
                                           triple_mask, train=train)
        ov_shape, pv_shape = self.gconv_ec_shape(ov_shape, pv_shape, edges,
                                                 obj_mask, triple_mask,
                                                 train=train)

        # distribution_before=True path: shared GCN over the concatenation
        ov = jnp.concatenate([ov_box, ov_shape], axis=1)
        pv = jnp.concatenate([pv_box, pv_shape], axis=1)
        ov, _ = self.gconv_shared(ov, pv, edges, obj_mask, triple_mask,
                                  train=train)
        d_box = ov_box.shape[1]
        ov_box, ov_shape = ov[:, :d_box], ov[:, d_box:]

        hb = self.box_mean_var(ov_box, mask=obj_mask, train=train)
        mu_box = self.box_mean(hb, mask=obj_mask, train=train)
        logvar_box = self.box_var(hb, mask=obj_mask, train=train)
        if self.use_angles:
            ha = self.angle_mean_var(ov_box, mask=obj_mask, train=train)
            mu_box = jnp.concatenate(
                [mu_box, self.angle_mean(ha, mask=obj_mask, train=train)], 1)
            logvar_box = jnp.concatenate(
                [logvar_box, self.angle_var(ha, mask=obj_mask, train=train)], 1)
        hs = self.shape_mean_var(ov_shape, mask=obj_mask, train=train)
        mu_shape = self.shape_mean(hs, mask=obj_mask, train=train)
        logvar_shape = self.shape_var(hs, mask=obj_mask, train=train)

        mu = jnp.concatenate([mu_box, mu_shape], axis=1)
        logvar = jnp.concatenate([logvar_box, logvar_shape], axis=1)
        return mu, logvar

    def manipulate(self, z_prime: jax.Array, view: SceneView,
                   train: bool = False) -> jax.Array:
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        man_in = jnp.concatenate([z_prime, self.obj_embed_dc_man(objs)], 1)
        pv = self.pred_embed_man_dc(predicates)
        out, _ = self.gconv_manipulation(man_in, pv, edges, obj_mask,
                                         triple_mask, train=train)
        return out

    def decode(self, z: jax.Array, view: SceneView, train: bool = False):
        """z [B·N, 2·ed] → (boxes, angle log-probs, shape codes [B·N, 256])."""
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        ov_box = jnp.concatenate([self.obj_embed_dc_box(objs), z], 1)
        ov_shape = jnp.concatenate([self.obj_embed_dc_shape(objs), z], 1)
        ov_box, _ = self.gconv_dec_box(ov_box, self.pred_embed_dc_box(predicates),
                                       edges, obj_mask, triple_mask, train=train)
        ov_shape, _ = self.gconv_dec_shape(
            ov_shape, self.pred_embed_dc_shape(predicates), edges, obj_mask,
            triple_mask, train=train)
        boxes = self.box_net(ov_box, mask=obj_mask, train=train)
        shapes = self.shape_net(ov_shape, mask=obj_mask, train=train)
        angles = None
        if self.use_angles:
            logits = self.angle_net(ov_box, mask=obj_mask, train=train)
            angles = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
        return boxes, angles, shapes

    def __call__(self, batch_enc: SceneView, batch_dec: SceneView,
                 shapes_gt: jax.Array, node_new: jax.Array,
                 node_changed: jax.Array, rngs_key: jax.Array,
                 train: bool = False) -> Dict[str, jax.Array]:
        k_rep, k_change = jax.random.split(rngs_key)
        mu, logvar = self.encode(batch_enc, shapes_gt, train=train)
        std = jnp.exp(0.5 * logvar)
        z = mu + std * jax.random.normal(k_rep, std.shape, std.dtype)

        B, N = batch_dec.objs.shape
        new_flat = node_new.reshape(B * N)
        touched = jnp.clip(new_flat + node_changed.reshape(B * N), 0, 1)
        z = z * (1.0 - new_flat[:, None])
        change = jax.random.normal(k_change, z.shape, z.dtype) * touched[:, None]
        z_prime = self.manipulate(jnp.concatenate([z, change], 1), batch_dec,
                                  train=train)
        z_out = z_prime if self.replace_latent else \
            z * (1 - touched[:, None]) + z_prime * touched[:, None]

        boxes, angles, shapes = self.decode(z_out, batch_dec, train=train)
        return {"mu": mu, "logvar": logvar, "z": z_out, "boxes": boxes,
                "angles": angles, "shapes": shapes}


def pseudo_shape_codes(objs_flat: np.ndarray, dim: int = 256) -> np.ndarray:
    """Deterministic per-class stand-in DeepSDF codes for environments
    without the DEEPSDF_reconstruction download (reference VAE.py:38-46
    reads real codes from disk). Same class → same code."""
    objs_flat = np.asarray(objs_flat).reshape(-1)
    codes = np.zeros((len(objs_flat), dim), np.float32)
    for i, c in enumerate(objs_flat):
        r = np.random.RandomState(int(c) + 7919)
        codes[i] = r.randn(dim).astype(np.float32) * 0.1
    return codes


class ShapeRetrieval:
    """Nearest-latent mesh retrieval (reference model/VAE.py:29-46,296-319):
    a database of DeepSDF codes per model id; queries return the id of the
    closest code by squared L2 (reference get_closest_vec). Candidates can
    be restricted per object class like the reference's
    ``box_data[class_name]`` lookup."""

    def __init__(self, codes: Dict[str, np.ndarray],
                 class_to_ids: Optional[Dict[str, list]] = None):
        self.codes = {k: np.asarray(v, np.float32) for k, v in codes.items()}
        self.ids = list(self.codes.keys())
        self.matrix = np.stack([self.codes[i] for i in self.ids]) if codes \
            else np.zeros((0, 256), np.float32)
        self.class_to_ids = class_to_ids or {}
        self._class_mats: Dict[str, tuple] = {}

    def _candidates(self, cname: Optional[str]):
        """(ids, stacked matrix) for a class (cached) or the full database."""
        if cname is None or cname not in self.class_to_ids:
            return self.ids, self.matrix
        if cname not in self._class_mats:
            cand = [i for i in self.class_to_ids[cname] if i in self.codes]
            mat = (np.stack([self.codes[i] for i in cand]) if cand
                   else np.zeros((0, 256), np.float32))
            self._class_mats[cname] = (cand, mat)
        return self._class_mats[cname]

    def lookup(self, query_codes: np.ndarray,
               class_names: Optional[list] = None) -> list:
        """query_codes [Q, 256] (+ optional per-query class names) → list of
        nearest model ids (None when no candidates exist)."""
        out = []
        for qi, q in enumerate(np.asarray(query_codes, np.float32)):
            cand, mat = self._candidates(
                class_names[qi] if class_names is not None else None)
            if not cand:
                out.append(None)
                continue
            d = np.sum((mat - q[None]) ** 2, axis=-1)
            out.append(cand[int(np.argmin(d))])
        return out

    @classmethod
    def from_deepsdf_dir(cls, root: str):
        """Build from a reference-style DEEPSDF_reconstruction tree
        (model/VAE.py:29-46: Codes/<id>.pth or .npy per model)."""
        import glob
        import os
        codes: Dict[str, np.ndarray] = {}
        code_dir = os.path.join(root, "Codes")
        for f in glob.glob(os.path.join(code_dir, "*")):
            mid = os.path.splitext(os.path.basename(f))[0]
            if f.endswith(".npy"):
                codes[mid] = np.load(f).reshape(-1)[:256].astype(np.float32)
            elif f.endswith((".pth", ".pt")):
                try:
                    import torch
                    codes[mid] = (torch.load(f, map_location="cpu")
                                  .detach().numpy().reshape(-1)[:256]
                                  .astype(np.float32))
                except Exception:
                    continue
        return cls(codes)
