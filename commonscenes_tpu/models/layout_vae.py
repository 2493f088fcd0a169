"""Scene-graph layout VAE (boxes + orientation bins) with manipulation.

Capability parity with the reference's Sg2ScVAEModel family — the encoder /
decoder / manipulation / relation-encoder networks shared by v1_box, v2_box
and the layout branch of v2_full (model/VAEGAN_V2FULL.py:22-289,
VAEGAN_V2BOX.py, VAEGAN_V1BOX.py). One module covers all three variants:
``use_clip=False`` is v1_box, ``use_clip=True`` is v2_box, and
``build_rel_encoder=True`` adds the E2 relation encoder + rel_mlp that
condition the shape-diffusion branch (VAEGAN_V2FULL.py:146-155, 220-242).

TPU redesign notes:
* every method consumes a padded ``SceneView`` and flattens it to one big
  [B·N]-node graph (core.graph.flatten_view) — identical semantics to the
  reference collate, but static shapes;
* node insertion for the "addition" manipulation becomes masking: the added
  node already owns a slot, the encoder view hides it, and its latent is
  replaced via ``node_new`` (vs. torch.cat index surgery at
  VAEGAN_V2FULL.py:480-508);
* the manipulation change-noise is an explicit jax.random key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from commonscenes_tpu.core.config import LayoutConfig
from commonscenes_tpu.core.graph import SceneView, flat_features, flatten_view
from commonscenes_tpu.nn.gcn import GraphTripleConvNet
from commonscenes_tpu.nn.mlp import MLP


class LayoutVAE(nn.Module):
    cfg: LayoutConfig
    num_obj_classes: int
    num_pred_classes: int
    build_rel_encoder: bool = False
    conditioning_key: str = "crossattn"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.cfg
        ed = cfg.embedding_dim
        gh = cfg.gconv_hidden_dim
        add = cfg.add_dim
        bn = cfg.mlp_normalization

        self.obj_embed_ec = nn.Embed(self.num_obj_classes + 1, ed)
        self.pred_embed_ec = nn.Embed(self.num_pred_classes, ed * 2)
        self.obj_embed_dc = nn.Embed(self.num_obj_classes + 1, ed)
        self.pred_embed_dc = nn.Embed(
            self.num_pred_classes, ed * 2 if cfg.decoder_cat else ed)
        if cfg.decoder_cat:
            self.pred_embed_man_dc = nn.Embed(self.num_pred_classes, ed * 3)

        self.box_embed = nn.Dense(cfg.box_embedding_dim, dtype=self.dtype)
        if cfg.use_angles:
            self.angle_embed = nn.Embed(cfg.num_angle_bins,
                                        cfg.angle_embedding_dim)

        # mean/var heads (VAEGAN_V2FULL.py:80-88)
        self.mean_var = MLP((gh, ed * 2), batch_norm=bn, dtype=self.dtype)
        self.mean_head = MLP((cfg.box_embedding_dim,), batch_norm=bn,
                             final_nonlinearity=False, dtype=self.dtype)
        self.var_head = MLP((cfg.box_embedding_dim,), batch_norm=bn,
                            final_nonlinearity=False, dtype=self.dtype)
        if cfg.use_angles:
            self.angle_mean_var = MLP((gh, ed * 2), batch_norm=bn,
                                      dtype=self.dtype)
            self.angle_mean_head = MLP((cfg.angle_embedding_dim,),
                                       batch_norm=bn, final_nonlinearity=False,
                                       dtype=self.dtype)
            self.angle_var_head = MLP((cfg.angle_embedding_dim,),
                                      batch_norm=bn, final_nonlinearity=False,
                                      dtype=self.dtype)

        gcn_common = dict(hidden_dim=gh, pooling=cfg.gconv_pooling,
                          num_layers=cfg.gconv_num_layers,
                          mlp_normalization=bn, residual=cfg.residual,
                          dtype=self.dtype)
        self.gconv_ec_box = GraphTripleConvNet(
            input_dim_obj=ed * 2 + add, input_dim_pred=ed * 2 + add,
            **gcn_common)
        dc_dim = ed * 2 + add if cfg.decoder_cat else ed + add
        self.gconv_dc = GraphTripleConvNet(
            input_dim_obj=dc_dim, input_dim_pred=dc_dim, **gcn_common)
        man_common = dict(gcn_common)
        man_common["num_layers"] = min(cfg.gconv_num_layers, 5)
        self.gconv_manipulation = GraphTripleConvNet(
            input_dim_obj=ed * 3 + add, input_dim_pred=ed * 3 + add,
            output_dim=ed, **man_common)
        if self.build_rel_encoder and cfg.use_e2:
            self.gconv_ec_rel = GraphTripleConvNet(
                input_dim_obj=ed * 2 + add, input_dim_pred=ed * 2 + add,
                **gcn_common)

        self.d3_net = MLP((gh, cfg.num_box_params), batch_norm=bn,
                          final_nonlinearity=False, dtype=self.dtype)
        if cfg.use_angles:
            self.angle_net = MLP((gh, cfg.num_angle_bins), batch_norm=bn,
                                 final_nonlinearity=False, dtype=self.dtype)
        if self.build_rel_encoder:
            if self.conditioning_key == "concat":
                rel_dims = (cfg.rel_hidden_concat, cfg.rel_out_concat)
            else:
                rel_dims = (cfg.rel_hidden_crossattn, cfg.rel_out_crossattn)
            self.rel_mlp = MLP(rel_dims, batch_norm=bn,
                               final_nonlinearity=False, dtype=self.dtype)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _dec_obj_feats(self, view: SceneView, objs, obj_mask):
        """[clip_text, obj_embed_dc] per node (VAEGAN_V2FULL.py:225-231)."""
        obj_vecs = self.obj_embed_dc(objs)
        if self.cfg.use_clip:
            text = flat_features(view.text_feats)
            obj_vecs = jnp.concatenate([text, obj_vecs], axis=1)
        return obj_vecs * obj_mask[:, None]

    def _dec_pred_feats(self, view: SceneView, predicates, embed):
        pred_vecs = embed(predicates)
        if self.cfg.use_clip:
            rel = flat_features(view.rel_feats)
            pred_vecs = jnp.concatenate([rel, pred_vecs], axis=1)
        return pred_vecs

    # ------------------------------------------------------------------
    # encoder (VAEGAN_V2FULL.py:185-218)
    # ------------------------------------------------------------------

    def encode(self, view: SceneView, train: bool = False):
        """→ (mu, logvar) with width box_embedding_dim [+ angle_embedding_dim]."""
        cfg = self.cfg
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)

        obj_vecs = self.obj_embed_ec(objs)
        pred_vecs = self.pred_embed_ec(predicates)
        if cfg.use_clip:
            obj_vecs = jnp.concatenate(
                [flat_features(view.text_feats), obj_vecs], axis=1)
            pred_vecs = jnp.concatenate(
                [flat_features(view.rel_feats), pred_vecs], axis=1)

        boxes = view.boxes.reshape(-1, view.boxes.shape[-1])
        d3_vecs = self.box_embed(boxes)
        parts = [obj_vecs, d3_vecs]
        if cfg.use_angles:
            parts.append(self.angle_embed(view.angles.reshape(-1)))
        obj_vecs = jnp.concatenate(parts, axis=1) * obj_mask[:, None]

        obj_vecs, _ = self.gconv_ec_box(obj_vecs, pred_vecs, edges, obj_mask,
                                        triple_mask, train=train)

        h = self.mean_var(obj_vecs, mask=obj_mask, train=train)
        mu = self.mean_head(h, mask=obj_mask, train=train)
        logvar = self.var_head(h, mask=obj_mask, train=train)
        if cfg.use_angles:
            ha = self.angle_mean_var(obj_vecs, mask=obj_mask, train=train)
            mu = jnp.concatenate(
                [mu, self.angle_mean_head(ha, mask=obj_mask, train=train)], axis=1)
            logvar = jnp.concatenate(
                [logvar, self.angle_var_head(ha, mask=obj_mask, train=train)], axis=1)
        return mu, logvar

    # ------------------------------------------------------------------
    # manipulation GCN (VAEGAN_V2FULL.py:244-259)
    # ------------------------------------------------------------------

    def manipulate(self, z_prime: jax.Array, view: SceneView,
                   train: bool = False) -> jax.Array:
        """z_prime [B·N, 2·ed] (latent ‖ change-noise) → refreshed latent
        [B·N, ed]."""
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        obj_vecs = self._dec_obj_feats(view, objs, obj_mask)
        pred_vecs = self._dec_pred_feats(view, predicates, self.pred_embed_man_dc)
        man_in = jnp.concatenate([z_prime, obj_vecs], axis=1)
        man_z, _ = self.gconv_manipulation(man_in, pred_vecs, edges, obj_mask,
                                           triple_mask, train=train)
        return man_z

    # ------------------------------------------------------------------
    # decoder (VAEGAN_V2FULL.py:261-289)
    # ------------------------------------------------------------------

    def decode(self, z: jax.Array, view: SceneView, train: bool = False):
        """z [B·N, ed] → (boxes [B·N, 6], angle log-probs [B·N, 24])."""
        cfg = self.cfg
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        obj_vecs = self._dec_obj_feats(view, objs, obj_mask)
        pred_vecs = self._dec_pred_feats(view, predicates, self.pred_embed_dc)

        if cfg.decoder_cat:
            obj_vecs = jnp.concatenate([obj_vecs, z], axis=1)
            obj_vecs, _ = self.gconv_dc(obj_vecs, pred_vecs, edges, obj_mask,
                                        triple_mask, train=train)
        else:
            obj_vecs, _ = self.gconv_dc(obj_vecs, pred_vecs, edges, obj_mask,
                                        triple_mask, train=train)
            obj_vecs = jnp.concatenate([obj_vecs, z], axis=1)

        d3 = self.d3_net(obj_vecs, mask=obj_mask, train=train)
        if cfg.use_angles:
            logits = self.angle_net(obj_vecs, mask=obj_mask, train=train)
            angles = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            return d3, angles
        return d3, None

    # ------------------------------------------------------------------
    # E2 relation encoder → diffusion conditioning (VAEGAN_V2FULL.py:220-242)
    # ------------------------------------------------------------------

    def rel_encode(self, z: jax.Array, view: SceneView, train: bool = False):
        """→ (uncond_rel [B·N, 1, W], cond_rel [B·N, 1, W]) relation tokens.

        ``uncond`` comes straight from [clip, obj_embed, z] through rel_mlp;
        ``cond`` additionally runs the E2 GCN. With use_e2=False cond is the
        uncond (reference VAEGAN_V2FULL.py:512-513).
        """
        objs, obj_mask, edges, predicates, triple_mask, _ = flatten_view(view)
        obj_vecs = self._dec_obj_feats(view, objs, obj_mask)
        pred_vecs = self._dec_pred_feats(view, predicates, self.pred_embed_dc)
        rel_in = jnp.concatenate([obj_vecs, z], axis=1)

        uc = self.rel_mlp(rel_in, mask=obj_mask, train=train)[:, None, :]
        if self.cfg.use_e2:
            rel2, _ = self.gconv_ec_rel(rel_in, pred_vecs, edges, obj_mask,
                                        triple_mask, train=train)
            c = self.rel_mlp(rel2, mask=obj_mask, train=train)[:, None, :]
        else:
            c = uc
        return uc, c

    # ------------------------------------------------------------------
    # convenience composite forwards
    # ------------------------------------------------------------------

    def reparameterize(self, key: jax.Array, mu: jax.Array,
                       logvar: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, std.shape, std.dtype)
        return mu + eps * std

    def make_z_prime(self, key: jax.Array, z: jax.Array,
                     touched: jax.Array) -> jax.Array:
        """Latent ‖ change-marker noise: N(0,1) on touched nodes, zeros
        elsewhere (VAEGAN_V2FULL.py:490-499)."""
        noise = jax.random.normal(key, z.shape, z.dtype)
        change = noise * touched[:, None]
        return jnp.concatenate([z, change], axis=1)

    def __call__(self, batch_enc: SceneView, batch_dec: SceneView,
                 node_new: jax.Array, node_changed: jax.Array,
                 rngs_key: jax.Array, train: bool = False):
        """Full manipulation-aware VAE pass (reference forward,
        VAEGAN_V2FULL.py:465-558, minus the diffusion branch).

        Returns dict with mu/logvar (enc-frame), z (dec-frame), box/angle
        predictions and the rel-encoder conditioning (if built).
        """
        cfg = self.cfg
        k_rep, k_change = jax.random.split(rngs_key)

        mu, logvar = self.encode(batch_enc, train=train)
        z = self.reparameterize(k_rep, mu, logvar)

        B, N = batch_dec.objs.shape
        new_flat = node_new.reshape(B * N)
        changed_flat = node_changed.reshape(B * N)
        touched = jnp.clip(new_flat + changed_flat, 0.0, 1.0)

        # added nodes enter with a zero latent (VAEGAN_V2FULL.py:480-488)
        z = z * (1.0 - new_flat[:, None])

        z_prime_in = self.make_z_prime(k_change, z, touched)
        z_prime = self.manipulate(z_prime_in, batch_dec, train=train)

        if cfg.replace_latent:
            z_out = z_prime
        else:
            z_out = z * (1.0 - touched[:, None]) + z_prime * touched[:, None]

        uc_rel = c_rel = None
        if self.build_rel_encoder:
            uc_rel, c_rel = self.rel_encode(z_out, batch_dec, train=train)

        boxes, angles = self.decode(z_out, batch_dec, train=train)
        return {
            "mu": mu,
            "logvar": logvar,
            "z": z_out,
            "boxes": boxes,
            "angles": angles,
            "uc_rel": uc_rel,
            "c_rel": c_rel,
        }
