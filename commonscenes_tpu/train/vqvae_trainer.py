"""Standalone first-stage trainers: VQ-VAE and unconditional/conditioned
SDFusion.

Capability parity with the reference's SDFusion-lineage harnesses
(model/vqvae_model.py:26-246 — L1 reconstruction + codebook loss via VQLoss
(model/losses.py:63-83), Adam optimizer; model/sdfusion_model.py:45-540 —
eps-objective diffusion over frozen VQ-VAE latents). The reference ships the
VQ-VAE checkpoint pretrained (README.md:62) and exposes no train CLI; here
both stages are first-class jitted train steps so the full pipeline can be
reproduced from scratch on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from commonscenes_tpu.core.config import DiffusionConfig, UNetConfig, VQVAEConfig
from commonscenes_tpu.diffusion import gaussian
from commonscenes_tpu.diffusion.schedule import make_noise_schedule
from commonscenes_tpu.nn.unet3d import ConditionedDenoiser
from commonscenes_tpu.nn.vqvae3d import VQVAE3D


@struct.dataclass
class SimpleTrainState:
    step: jax.Array
    params: Any
    opt_state: Any


class VQVAETrainer:
    """L1 + codebook-loss autoencoder training (VQLoss semantics:
    loss = mean |x − x̂| + codebook_weight · emb_loss)."""

    def __init__(self, cfg: VQVAEConfig, lr: float = 1e-4,
                 codebook_weight: float = 1.0, dtype=None):
        self.cfg = cfg
        self.codebook_weight = codebook_weight
        self.model = VQVAE3D(cfg, dtype=dtype)
        self.tx = optax.adam(lr, b1=0.5, b2=0.9)

    def init_state(self, key: jax.Array, sample_sdf: jax.Array) -> SimpleTrainState:
        variables = self.model.init(key, sample_sdf)
        params = variables["params"]
        return SimpleTrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=self.tx.init(params))

    def _loss(self, params, x):
        rec, emb_loss = self.model.apply({"params": params}, x)
        rec_l1 = jnp.mean(jnp.abs(x - rec))
        total = rec_l1 + self.codebook_weight * emb_loss
        return total, {"loss_total": total, "loss_rec": rec_l1,
                       "loss_codebook": emb_loss}

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: SimpleTrainState, x: jax.Array
                   ) -> Tuple[SimpleTrainState, Dict[str, jax.Array]]:
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, x)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SimpleTrainState(step=state.step + 1, params=params,
                                opt_state=opt_state), metrics


class SDFusionTrainer:
    """Latent-diffusion training over a frozen VQ-VAE (the standalone
    sdfusion_model.py harness: encode → q_sample → eps loss)."""

    def __init__(self, vq_cfg: VQVAEConfig, unet_cfg: UNetConfig,
                 diff_cfg: DiffusionConfig, lr: float = 1e-4, dtype=None):
        self.vq_cfg = vq_cfg
        self.diff_cfg = diff_cfg
        self.vqvae = VQVAE3D(vq_cfg, dtype=dtype)
        self.denoiser = ConditionedDenoiser(
            unet_cfg, conditioning_key=diff_cfg.conditioning_key, dtype=dtype)
        self.sched = make_noise_schedule(
            diff_cfg.timesteps, diff_cfg.beta_schedule, diff_cfg.linear_start,
            diff_cfg.linear_end, parameterization=diff_cfg.parameterization)
        self.tx = optax.adamw(lr, weight_decay=0.01)

    def init_state(self, key: jax.Array, sample_sdf: jax.Array,
                   sample_cond: jax.Array, vqvae_params: Any
                   ) -> SimpleTrainState:
        z = self.vqvae.apply({"params": vqvae_params}, sample_sdf,
                             method=VQVAE3D.encode_no_quant)
        t = jnp.zeros((z.shape[0],), jnp.int32)
        variables = self.denoiser.init(key, z, t, sample_cond)
        params = variables["params"]
        return SimpleTrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=self.tx.init(params))

    def _loss(self, params, vqvae_params, x, cond, key):
        z = self.vqvae.apply({"params": vqvae_params}, x,
                             method=VQVAE3D.encode_no_quant)
        z = jax.lax.stop_gradient(z.astype(jnp.float32))
        k_t, k_n = jax.random.split(key)
        t = gaussian.sample_timesteps(k_t, z.shape[0], self.sched.num_timesteps)
        noise = jax.random.normal(k_n, z.shape, z.dtype)

        def denoise_fn(x_noisy, tt, c):
            return self.denoiser.apply({"params": params}, x_noisy, tt, c)

        losses = gaussian.p_losses(denoise_fn, self.sched, z, cond, t, noise)
        return losses.total, {"loss_total": losses.total,
                              "loss_simple": losses.simple,
                              "loss_vlb": losses.vlb}

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: SimpleTrainState, vqvae_params, x, cond, key
                   ) -> Tuple[SimpleTrainState, Dict[str, jax.Array]]:
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, vqvae_params, x, cond, key)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SimpleTrainState(step=state.step + 1, params=params,
                                opt_state=opt_state), metrics
