"""Jitted training step for the v1_full (Graph-to-3D) variant.

Loss assembly parity with reference scripts/train_3dfront.py:316-392 on the
v1_full branch:

  generator: L1(box)+NLL(angle)+0.1·KL  +  L1(shape codes)+0.1·KL_shape
           + 0.1·(bce(aux fake→real) + CE(aux fake logits, class))
           + 0.1·box GAN generator loss
  shape-aux discriminator: bce(real,1)+bce(fake,0)+CE(real)+CE(fake_detached)
  box discriminator: as in the v2 trainer (bce + γ/2 gradient penalty)

All row selections (kept nodes, padded slots) are weight masks.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from commonscenes_tpu.core.config import FullConfig
from commonscenes_tpu.core.graph import GraphBatch
from commonscenes_tpu.models.discriminators import BoxDiscriminator, ShapeAuxiliary
from commonscenes_tpu.models.losses import (bce_with_logits,
                                            layout_vae_losses, masked_mean)
from commonscenes_tpu.models.v1_full import V1FullVAE
from commonscenes_tpu.train.state import (clip_subtree_by_norm,
                                          make_discriminator_optimizer,
                                          scrub_nan_grads)
from commonscenes_tpu.train.step_v2full import (V2FullTrainer,
                                                _touched_triple_mask,
                                                _weighted_bce)


@struct.dataclass
class V1TrainState:
    step: jax.Array
    params: Any
    stats: Any
    aux_params: Any
    aux_stats: Any
    boxd_params: Any
    boxd_stats: Any
    opt: Any
    aux_opt: Any
    boxd_opt: Any


def _masked_ce(logits, labels, mask):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -masked_mean(picked, mask)


class V1FullTrainer:
    def __init__(self, cfg: FullConfig, model: V1FullVAE, num_obj_classes: int,
                 num_pred_classes: int):
        self.cfg = cfg
        self.model = model
        self.boxD = BoxDiscriminator(num_obj_classes=num_obj_classes,
                                     num_pred_classes=num_pred_classes)
        self.shape_aux = ShapeAuxiliary(num_classes=num_obj_classes)
        # reference-faithful: every non-v2_full variant trains with plain
        # Adam at auxlr and NO lr schedule/weight decay
        # (scripts/train_3dfront.py:249-252 "optimizer for model v1 and
        # v2_box ... optim.Adam(params, lr=args.auxlr)"); the milestone
        # schedule belongs to v2_full's optimizerFULL only
        self.tx = optax.adam(cfg.train.aux_lr)
        self.aux_tx = make_discriminator_optimizer(cfg.train)
        self.boxd_tx = make_discriminator_optimizer(cfg.train)

    # reference D-step math is identical across variants
    # (scripts/train_3dfront.py:355-385 runs the same boxD update for the
    # v1 branches); reuse the v2 trainer's implementation verbatim
    _disc_loss = V2FullTrainer._disc_loss

    def init_state(self, key, batch: GraphBatch, shapes_gt) -> V1TrainState:
        k1, k2, k3 = jax.random.split(key, 3)

        def model_init(k, enc, dec, sg, nn_, nc_):
            return self.model.init({"params": k}, enc, dec, sg, nn_, nc_,
                                   jax.random.PRNGKey(0), train=False)

        variables = jax.jit(model_init)(k1, batch.enc, batch.dec, shapes_gt,
                                        batch.node_new, batch.node_changed)
        aux_vars = jax.jit(self.shape_aux.init)(k2, shapes_gt)
        boxes_flat = batch.dec.boxes.reshape(-1, batch.dec.boxes.shape[-1])

        def boxd_init(key, dec, boxes):
            return self.boxD.init(key, self.boxD.features(dec, boxes))

        boxd_vars = jax.jit(boxd_init)(k3, batch.dec, boxes_flat)
        return V1TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            stats=variables.get("batch_stats", {}),
            aux_params=aux_vars["params"],
            aux_stats=aux_vars.get("batch_stats", {}),
            boxd_params=boxd_vars["params"],
            boxd_stats=boxd_vars.get("batch_stats", {}),
            opt=self.tx.init(variables["params"]),
            aux_opt=self.aux_tx.init(aux_vars["params"]),
            boxd_opt=self.boxd_tx.init(boxd_vars["params"]),
        )

    # ------------------------------------------------------------------

    def _gen_loss(self, params, stats, aux_params, aux_stats, boxd_params,
                  boxd_stats, batch: GraphBatch, shapes_gt, key):
        cfg = self.cfg
        out, updates = self.model.apply(
            {"params": params, "batch_stats": stats}, batch.enc, batch.dec,
            shapes_gt, batch.node_new, batch.node_changed, key, train=True,
            mutable=["batch_stats"])

        B, N = batch.dec.objs.shape
        keep = batch.keep_mask.reshape(B * N)
        dec_boxes = batch.dec.boxes.reshape(B * N, -1)
        dec_angles = batch.dec.angles.reshape(B * N)
        enc_mask = batch.enc.obj_mask.reshape(-1)

        d_box = self.model.box_embedding_dim + self.model.angle_embedding_dim
        mu_box, mu_shape = out["mu"][:, :d_box], out["mu"][:, d_box:]
        lv_box, lv_shape = out["logvar"][:, :d_box], out["logvar"][:, d_box:]

        box_loss, parts = layout_vae_losses(
            out["boxes"], dec_boxes, out["angles"], dec_angles, mu_box,
            lv_box, keep_mask=keep, enc_mask=enc_mask,
            kl_weight=cfg.train.kl_weight)
        shape_loss, shape_parts = layout_vae_losses(
            out["shapes"], shapes_gt, None, None, mu_shape, lv_shape,
            keep_mask=keep, enc_mask=enc_mask, kl_weight=cfg.train.kl_weight)

        # shape-aux generator terms (train_3dfront.py:318-331, 0.1·loss_genShape)
        # — train-mode BN like the reference's always-train shapeClassifier
        # (its stat refresh belongs to the aux step; updates discarded here)
        objs_flat = batch.dec.objs.reshape(B * N)
        aux_vars = {"params": aux_params, "batch_stats": aux_stats}
        (logits_g, rf_g), _ = self.shape_aux.apply(
            aux_vars, out["shapes"], mask=keep, train=True,
            mutable=["batch_stats"])
        gen_shape = _weighted_bce(rf_g, 1.0, keep) + \
            _masked_ce(logits_g, objs_flat, keep)

        total = box_loss + shape_loss + 0.1 * gen_shape
        metrics = {**{f"box_{k}": v for k, v in parts.items()},
                   **{f"shape_{k}": v for k, v in shape_parts.items()},
                   "genShape": gen_shape}

        if cfg.train.weight_d_box > 0:
            boxes_pred_in = keep[:, None] * dec_boxes + \
                (1 - keep[:, None]) * out["boxes"]
            feats = self.boxD.features(batch.dec, boxes_pred_in)
            logits = self.boxD.apply(
                {"params": boxd_params, "batch_stats": boxd_stats}, feats)
            w = _touched_triple_mask(batch)
            g_loss = _weighted_bce(logits, 1.0, w)
            total = total + cfg.train.weight_d_box * g_loss
            metrics["boxG"] = g_loss

        metrics["total"] = total
        return total, (updates, metrics, out)

    def _aux_loss(self, aux_params, aux_stats, shapes_pred, shapes_gt,
                  objs_flat, keep):
        # the reference shapeClassifier stays in train mode for BOTH the
        # fake and real passes (train_3dfront.py:317-319) — running stats
        # chain sequentially fake → real; eval-mode fake normalization would
        # hand the discriminator a normalization cue instead of content
        aux_vars = {"params": aux_params, "batch_stats": aux_stats}
        (logits_fake, rf_fake), ups_f = self.shape_aux.apply(
            aux_vars, jax.lax.stop_gradient(shapes_pred), mask=keep,
            train=True, mutable=["batch_stats"])
        (logits_real, rf_real), ups = self.shape_aux.apply(
            {"params": aux_params, "batch_stats": ups_f["batch_stats"]},
            shapes_gt, mask=keep, train=True, mutable=["batch_stats"])
        loss = (_weighted_bce(rf_fake, 0.0, keep)
                + _weighted_bce(rf_real, 1.0, keep)
                + _masked_ce(logits_real, objs_flat, keep)
                + _masked_ce(logits_fake, objs_flat, keep))
        return loss, ups

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: V1TrainState, batch: GraphBatch, shapes_gt,
                   key) -> Tuple[V1TrainState, Dict[str, Any]]:
        cfg = self.cfg
        (_, (updates, metrics, out)), grads = jax.value_and_grad(
            self._gen_loss, has_aux=True)(
            state.params, state.stats, state.aux_params, state.aux_stats,
            state.boxd_params, state.boxd_stats, batch, shapes_gt, key)
        grads = scrub_nan_grads(grads)
        grads = clip_subtree_by_norm({"all": grads},
                                     cfg.train.grad_clip_norm)["all"]
        up, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, up)

        B, N = batch.dec.objs.shape
        keep = batch.keep_mask.reshape(B * N)
        objs_flat = batch.dec.objs.reshape(B * N)
        (_, aux_ups), aux_grads = jax.value_and_grad(
            self._aux_loss, has_aux=True)(
            state.aux_params, state.aux_stats, out["shapes"], shapes_gt,
            objs_flat, keep)
        aux_up, aux_opt = self.aux_tx.update(scrub_nan_grads(aux_grads),
                                             state.aux_opt, state.aux_params)
        aux_params = optax.apply_updates(state.aux_params, aux_up)

        # box-discriminator step (reference trains it every iteration for
        # the v1 branches too: train_3dfront.py:355-385 boxDloss.backward()
        # + optimizerDbox.step(); same math as the v2 trainer)
        boxd_params, boxd_stats, boxd_opt = (state.boxd_params,
                                             state.boxd_stats,
                                             state.boxd_opt)
        if cfg.train.weight_d_box > 0:
            dec_boxes = batch.dec.boxes.reshape(B * N, -1)
            boxes_pred_in = keep[:, None] * dec_boxes + \
                (1 - keep[:, None]) * out["boxes"]
            (_, (d_ups, d_metrics)), d_grads = jax.value_and_grad(
                self._disc_loss, has_aux=True)(
                state.boxd_params, state.boxd_stats, batch, boxes_pred_in)
            d_up, boxd_opt = self.boxd_tx.update(
                scrub_nan_grads(d_grads), state.boxd_opt, state.boxd_params)
            boxd_params = optax.apply_updates(state.boxd_params, d_up)
            boxd_stats = d_ups.get("batch_stats", state.boxd_stats)
            metrics.update(d_metrics)

        new_state = state.replace(
            step=state.step + 1, params=params,
            stats=updates.get("batch_stats", state.stats),
            aux_params=aux_params,
            aux_stats=aux_ups.get("batch_stats", state.aux_stats),
            boxd_params=boxd_params, boxd_stats=boxd_stats,
            opt=opt, aux_opt=aux_opt, boxd_opt=boxd_opt)
        return new_state, metrics
