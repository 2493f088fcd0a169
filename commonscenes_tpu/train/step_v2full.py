"""One jitted training step for CommonScenes v2_full (and the box-only
variants when the shape branch is absent).

Loss assembly parity with reference scripts/train_3dfront.py:300-420:

  total = L1(box) + NLL(angle) + 0.1·KL            (calculate_model_losses)
        + 100 · diffusion eps-loss                  (model.vae_v2.Diff.loss_df)
        + 0.1 · generator GAN loss                  (weight_D_box · boxGloss)
  discriminator: bce(real,1) + bce(fake,0) + γ/2 · gradient penalty

The reference runs two backward passes over shared activations with
``retain_graph=True``; here generator and discriminator are two explicit
`jax.grad` computations inside one jitted function — same math, no aliasing
hazards. Gradients are per-branch norm-clipped at 5.0 and NaN-scrubbed
(train_3dfront.py:396-410).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from commonscenes_tpu.core.config import FullConfig
from commonscenes_tpu.core.graph import GraphBatch, flatten_view
from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
from commonscenes_tpu.models.discriminators import (BoxDiscriminator,
                                                    gradient_penalty)
from commonscenes_tpu.models.losses import bce_with_logits, layout_vae_losses
from commonscenes_tpu.train.state import (TrainState, clip_subtree_by_norm,
                                          make_discriminator_optimizer,
                                          make_generator_optimizer,
                                          scrub_nan_grads)


def _weighted_bce(logits, target, weights):
    per = bce_with_logits(logits[:, 0], target)
    w = weights.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _touched_triple_mask(batch: GraphBatch) -> jax.Array:
    """1 for valid triples with at least one manipulated/added endpoint
    (reference BoxDiscriminator keeps logic, discriminators.py:117-121)."""
    B, N = batch.dec.objs.shape
    touched = jnp.clip(batch.node_new + batch.node_changed, 0, 1).reshape(B * N)
    _, _, edges, _, triple_mask, _ = flatten_view(batch.dec)
    t_s = jnp.take(touched, edges[:, 0])
    t_o = jnp.take(touched, edges[:, 1])
    return jnp.clip(t_s + t_o, 0, 1) * triple_mask


class V2FullTrainer:
    """Builds the jitted train step. ``with_shapes=False`` degrades to the
    v1_box/v2_box layout-only objective."""

    def __init__(self, cfg: FullConfig, model: CommonScenesV2Full,
                 with_shapes: bool = True):
        self.cfg = cfg
        self.model = model
        self.with_shapes = with_shapes
        self.boxD = BoxDiscriminator(
            num_obj_classes=model.num_obj_classes,
            num_pred_classes=model.num_pred_classes)
        self.gen_tx = make_generator_optimizer(cfg.train)
        self.disc_tx = make_discriminator_optimizer(cfg.train)

    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array, batch: GraphBatch) -> TrainState:
        k_model, k_disc = jax.random.split(key)
        # jitted init: eager per-op dispatch is pathological over a tunneled
        # TPU (~minutes for the VQ-VAE alone)
        variables = jax.jit(self.model.init, static_argnums=2)(
            k_model, batch, self.with_shapes)

        def disc_init(key, dec, boxes_flat):
            feats = self.boxD.features(dec, boxes_flat)
            return self.boxD.init(key, feats)

        boxes_flat = batch.dec.boxes.reshape(-1, batch.dec.boxes.shape[-1])
        disc_vars = jax.jit(disc_init)(k_disc, batch.dec, boxes_flat)

        gen_params = {"layout": variables["layout"]["params"],
                      "df": variables["df"].get("params", {})}
        gen_stats = {"layout": variables["layout"].get("batch_stats", {})}
        disc_params = disc_vars["params"]
        disc_stats = disc_vars.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_stats=gen_stats,
            vqvae_params=variables["vqvae"].get("params", {}),
            disc_params=disc_params,
            disc_stats=disc_stats,
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init(disc_params),
        )

    # ------------------------------------------------------------------

    def _gen_loss(self, gen_params, gen_stats, vqvae_params, disc_params,
                  disc_stats, batch: GraphBatch, key):
        cfg = self.cfg
        variables = {
            "layout": {"params": gen_params["layout"],
                       "batch_stats": gen_stats["layout"]},
            "df": {"params": gen_params["df"]} if self.with_shapes else None,
            "vqvae": {"params": vqvae_params} if self.with_shapes else None,
        }
        outputs, updates = self.model.train_forward(variables, batch, key,
                                                    train=True)

        B, N = batch.dec.objs.shape
        keep = outputs.keep
        dec_boxes = batch.dec.boxes.reshape(B * N, -1)
        dec_angles = batch.dec.angles.reshape(B * N)
        enc_mask = batch.enc.obj_mask.reshape(-1)

        vae_loss, vae_parts = layout_vae_losses(
            outputs.boxes, dec_boxes, outputs.angles, dec_angles,
            outputs.mu, outputs.logvar, keep_mask=keep, enc_mask=enc_mask,
            kl_weight=cfg.train.kl_weight)

        total = vae_loss
        metrics = dict(vae_parts)

        if self.with_shapes and outputs.diff_losses is not None:
            total = total + cfg.train.shape_loss_weight * outputs.diff_losses.total
            metrics["diff_total"] = outputs.diff_losses.total
            metrics["diff_simple"] = outputs.diff_losses.simple
            metrics["diff_vlb"] = outputs.diff_losses.vlb

        # generator GAN term on the blended boxes (train_3dfront.py:358-375)
        if cfg.train.weight_d_box > 0:
            boxes_pred_in = keep[:, None] * dec_boxes + \
                (1.0 - keep[:, None]) * outputs.boxes
            feats = self.boxD.features(batch.dec, boxes_pred_in)
            logits = self.boxD.apply(
                {"params": disc_params, "batch_stats": disc_stats}, feats)
            w = _touched_triple_mask(batch)
            g_loss = _weighted_bce(logits, 1.0, w)
            total = total + cfg.train.weight_d_box * g_loss
            metrics["boxG"] = g_loss

        metrics["total"] = total
        return total, (updates, metrics, outputs)

    # ------------------------------------------------------------------

    def _disc_loss(self, disc_params, disc_stats, batch: GraphBatch,
                   boxes_pred_in):
        """bce(real/fake) + γ/2·gradient-penalty; the input-gradient for the
        penalty is an explicit jax.grad through the discriminator."""
        cfg = self.cfg
        dvars = {"params": disc_params, "batch_stats": disc_stats}
        B, N = batch.dec.objs.shape
        dec_boxes = batch.dec.boxes.reshape(B * N, -1)
        _, _, _, _, triple_mask, _ = flatten_view(batch.dec)
        w_fake = _touched_triple_mask(batch)
        w_real = triple_mask

        x_fake = self.boxD.features(batch.dec, jax.lax.stop_gradient(boxes_pred_in))
        x_real = self.boxD.features(batch.dec, dec_boxes)

        def logits_sum_train(variables):
            # train-mode BN like the torch reference's D step; one forward
            # yields the loss logits AND the BN-stat refresh
            def f(x):
                logits, ups = self.boxD.apply(variables, x, train=True,
                                              mutable=["batch_stats"])
                return jnp.sum(logits), (logits, ups)
            return f

        # running stats refresh SEQUENTIALLY through both passes like the
        # torch reference (D(fake) then D(real) each update BN stats);
        # train-mode logits use batch statistics, so only the running-stat
        # trajectory depends on the chaining
        (_, (logits_fake, ups_fake)), gx_fake = jax.value_and_grad(
            logits_sum_train(dvars), has_aux=True)(x_fake)
        dvars_after_fake = {"params": disc_params,
                            "batch_stats": ups_fake["batch_stats"]}
        (_, (logits_real, ups)), gx_real = jax.value_and_grad(
            logits_sum_train(dvars_after_fake), has_aux=True)(x_real)

        d_fake = _weighted_bce(logits_fake, 0.0, w_fake)
        d_real = _weighted_bce(logits_real, 1.0, w_real)
        reg_fake = gradient_penalty(logits_fake, gx_fake, is_real=False)[:, 0]
        reg_real = gradient_penalty(logits_real, gx_real, is_real=True)[:, 0]
        reg = (jnp.sum(reg_fake * w_fake) + jnp.sum(reg_real * w_real)) / \
            jnp.maximum(jnp.sum(w_fake) + jnp.sum(w_real), 1.0)

        loss = d_fake + d_real + (cfg.train.gan_gamma / 2.0) * reg
        return loss, (ups, {"boxD": loss, "boxD_real": d_real,
                            "boxD_fake": d_fake, "boxD_reg": reg})

    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch: GraphBatch,
                   key: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        cfg = self.cfg

        (_, (gen_updates, metrics, outputs)), gen_grads = jax.value_and_grad(
            self._gen_loss, has_aux=True)(
            state.gen_params, state.gen_stats, state.vqvae_params,
            state.disc_params, state.disc_stats, batch, key)

        gen_grads = scrub_nan_grads(gen_grads)
        gen_grads = clip_subtree_by_norm(gen_grads, cfg.train.grad_clip_norm)
        gen_up, gen_opt = self.gen_tx.update(gen_grads, state.gen_opt,
                                             state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_up)
        gen_stats = {"layout": gen_updates["layout"].get(
            "batch_stats", state.gen_stats["layout"])}

        disc_params, disc_stats, disc_opt = (state.disc_params,
                                             state.disc_stats, state.disc_opt)
        if cfg.train.weight_d_box > 0:
            B, N = batch.dec.objs.shape
            keep = outputs.keep[:, None]
            dec_boxes = batch.dec.boxes.reshape(B * N, -1)
            boxes_pred_in = keep * dec_boxes + (1 - keep) * outputs.boxes
            (_, (disc_updates, d_metrics)), disc_grads = jax.value_and_grad(
                self._disc_loss, has_aux=True)(
                state.disc_params, state.disc_stats, batch, boxes_pred_in)
            disc_grads = scrub_nan_grads(disc_grads)
            disc_up, disc_opt = self.disc_tx.update(disc_grads, state.disc_opt,
                                                    state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, disc_up)
            disc_stats = disc_updates.get("batch_stats", state.disc_stats)
            metrics.update(d_metrics)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_stats=gen_stats,
            gen_opt=gen_opt,
            disc_params=disc_params,
            disc_stats=disc_stats,
            disc_opt=disc_opt,
        )
        return new_state, metrics
