"""CommonScenes v2_full: layout VAE + relation-conditioned latent shape
diffusion, composed as pure JAX functions over explicit parameter trees.

Capability parity with the reference's Sg2ScVAEModel(v2_full) + SDFusion
engine composition (model/VAEGAN_V2FULL.py:465-558,
model/sdfusion_txt2shape_model.py:348-365, :460-516):

* training: encode → reparameterize → manipulate → E2 relation tokens →
  select SDF subset → frozen VQ-VAE encode → eps-loss; decoder → boxes/angles.
* sampling: z ~ N(mean_est, cov_est) per node → relation tokens → DDIM with
  CFG (uc_scale 3) → VQ-VAE decode → boxes/angles.

TPU redesign: the frozen VQ-VAE is a separate parameter tree (never sees the
optimizer — the reference instead filters requires_grad); the class-balanced
SDF selection is host-side index bookkeeping carried in ShapeBatch; the
whole train forward is one jittable function; DDIM is a lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import FullConfig
from commonscenes_tpu.core.graph import GraphBatch, SceneView, ShapeBatch
from commonscenes_tpu.diffusion import gaussian
from commonscenes_tpu.diffusion.ddim import ddim_sample
from commonscenes_tpu.diffusion.schedule import (make_ddim_tables,
                                                 make_noise_schedule)
from commonscenes_tpu.models.layout_vae import LayoutVAE
from commonscenes_tpu.nn.unet3d import ConditionedDenoiser
from commonscenes_tpu.nn.vqvae3d import VQVAE3D


class ModelOutputs(NamedTuple):
    mu: jax.Array
    logvar: jax.Array
    boxes: jax.Array            # [B·N, 6] predictions (normalized space)
    angles: Optional[jax.Array]  # [B·N, 24] log-probs
    keep: jax.Array             # [B·N] 1 = untouched node
    diff_losses: Optional[gaussian.DiffusionLosses]


class CommonScenesV2Full:
    """Builder/holder for the three module trees + schedule tables."""

    def __init__(self, cfg: FullConfig, num_obj_classes: int,
                 num_pred_classes: int, dtype=None):
        self.cfg = cfg
        self.num_obj_classes = num_obj_classes
        self.num_pred_classes = num_pred_classes
        self.dtype = dtype

        self.layout = LayoutVAE(
            cfg.layout, num_obj_classes, num_pred_classes,
            build_rel_encoder=True,
            conditioning_key=cfg.diffusion.conditioning_key, dtype=dtype)
        self.denoiser = ConditionedDenoiser(
            cfg.unet, conditioning_key=cfg.diffusion.conditioning_key,
            dtype=dtype)
        self.vqvae = VQVAE3D(cfg.vqvae, dtype=dtype)
        self.sched = make_noise_schedule(
            cfg.diffusion.timesteps, cfg.diffusion.beta_schedule,
            cfg.diffusion.linear_start, cfg.diffusion.linear_end,
            cfg.diffusion.cosine_s, parameterization=cfg.diffusion.parameterization)
        self.ddim_tables = make_ddim_tables(
            self.sched, cfg.diffusion.ddim_steps, cfg.diffusion.ddim_eta)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, key: jax.Array, batch: GraphBatch,
             with_shapes: bool = True) -> Dict[str, Any]:
        """Returns {'layout': vars, 'df': vars, 'vqvae': vars} flax variable
        trees (each may contain 'params' and 'batch_stats'). With
        ``with_shapes=False`` (box-only variants) the diffusion/VQ-VAE trees
        are empty."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        layout_vars = self.layout.init(
            {"params": k1}, batch.enc, batch.dec, batch.node_new,
            batch.node_changed, k4, train=False)
        if not with_shapes:
            return {"layout": layout_vars, "df": {}, "vqvae": {}}

        z_sp = self.cfg.vqvae.z_spatial
        zc = self.cfg.vqvae.embed_dim
        S = batch.shapes.sdf.shape[0] if batch.shapes is not None else 1
        x_lat = jnp.zeros((S, z_sp, z_sp, z_sp, zc), jnp.float32)
        t = jnp.zeros((S,), jnp.int32)
        cond = self._dummy_cond(S)
        df_vars = self.denoiser.init({"params": k2}, x_lat, t, cond)

        R = self.cfg.batch.sdf_res
        vq_vars = self.vqvae.init({"params": k3}, jnp.zeros((1, R, R, R, 1)))
        return {"layout": layout_vars, "df": df_vars, "vqvae": vq_vars}

    def _dummy_cond(self, S: int) -> jax.Array:
        if self.cfg.diffusion.conditioning_key == "crossattn":
            return jnp.zeros((S, 1, self.cfg.layout.rel_out_crossattn))
        return jnp.zeros((S, self.cfg.layout.rel_out_concat))

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------

    def train_forward(self, variables: Dict[str, Any], batch: GraphBatch,
                      key: jax.Array, train: bool = True
                      ) -> Tuple[ModelOutputs, Dict[str, Any]]:
        """Full v2_full forward. Returns outputs + mutated batch_stats."""
        k_layout, k_t, k_noise = jax.random.split(key, 3)

        mutable = ["batch_stats"] if train else []
        layout_out, layout_updates = self.layout.apply(
            variables["layout"], batch.enc, batch.dec, batch.node_new,
            batch.node_changed, k_layout, train=train, mutable=mutable)

        diff_losses = None
        if batch.shapes is not None:
            diff_losses = self._shape_branch(
                variables, batch.shapes, layout_out["uc_rel"],
                layout_out["c_rel"], k_t, k_noise, train=train)

        keep = batch.keep_mask.reshape(-1)
        outputs = ModelOutputs(
            mu=layout_out["mu"], logvar=layout_out["logvar"],
            boxes=layout_out["boxes"], angles=layout_out["angles"],
            keep=keep, diff_losses=diff_losses)
        updates = {"layout": layout_updates} if train else {}
        return outputs, updates

    def _gather_cond(self, rel: jax.Array, shapes: ShapeBatch,
                     max_objs: int) -> jax.Array:
        """rel [B·N, 1, W] → per-selected-object cond [S, 1, W] (or reshaped
        concat grid)."""
        flat_idx = shapes.scene_idx * max_objs + shapes.slot_idx
        sel = jnp.take(rel, flat_idx, axis=0)
        if self.cfg.diffusion.conditioning_key == "concat":
            return sel.reshape(sel.shape[0], -1)
        return sel

    def _shape_branch(self, variables, shapes: ShapeBatch, uc_rel, c_rel,
                      k_t, k_noise, train: bool) -> gaussian.DiffusionLosses:
        """Diffusion eps-loss on the selected SDF subset (reference
        VAEGAN_V2FULL.py:511-521 → sdfusion forward :348-365)."""
        max_objs = self.cfg.batch.max_objs
        cond = self._gather_cond(c_rel if c_rel is not None else uc_rel,
                                 shapes, max_objs)

        # frozen first stage: encode SDF → latent, no gradients
        z = self.vqvae.apply(variables["vqvae"], shapes.sdf,
                             method=VQVAE3D.encode_no_quant)
        z = jax.lax.stop_gradient(z.astype(jnp.float32))

        S = z.shape[0]
        t = gaussian.sample_timesteps(k_t, S, self.sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)

        def denoise_fn(x_noisy, tt, c):
            return self.denoiser.apply(variables["df"], x_noisy, tt, c)

        return gaussian.p_losses(
            denoise_fn, self.sched, z, cond, t, noise,
            sample_mask=shapes.mask,
            l_simple_weight=self.cfg.diffusion.l_simple_weight,
            original_elbo_weight=self.cfg.diffusion.original_elbo_weight)

    # ------------------------------------------------------------------
    # sampling (reference VAEGAN_V2FULL.sample :600-618 + rel2shape :460-516)
    # ------------------------------------------------------------------

    def sample(self, variables: Dict[str, Any], dec: SceneView,
               mean_est: jax.Array, cov_chol: jax.Array, key: jax.Array,
               gen_shape: bool = True, shape_mask: Optional[jax.Array] = None,
               ddim_tables=None, uc_scale: Optional[float] = None,
               shared_noise: bool = True,
               shape_slot_idx: Optional[jax.Array] = None,
               sampler: str = "ddim", slot_sharding=None):
        """Generate boxes/angles (+ SDF grids) for a decoder-view batch.

        mean_est [Dz] / cov_chol [Dz, Dz] are the train-set latent statistics
        (Cholesky factor of the covariance); z = mean + L·ε reproduces the
        reference's np.random.multivariate_normal draw (VAE.py:160-191).
        ``shared_noise`` repeats a single x_T across objects like the
        reference's rel2shape (sdfusion_txt2shape_model.py:487-491).

        ``shape_slot_idx`` (i32 [K], flat indices into B·N, host-computed)
        packs shape generation to the real furniture slots — DDIM then runs
        at batch K instead of B·N, skipping padded/root slots (the reference
        equivalently selects nonzero-SDF rows, VAEGAN_V2FULL.py:606-614).
        The returned sdf is [K, R, R, R, 1] in slot order.

        ``slot_sharding`` (a ``NamedSharding`` over a data axis): shards the
        packed K axis of the whole diffusion+decode program across the mesh
        — single-scene latency mode. The per-slot chains are independent
        (per-sample norms, per-slot conditioning), so XLA partitions the
        DDIM scan with no cross-slot collectives; the reference instead runs
        its slots through a SERIAL mini-batch-of-7 loop
        (sdfusion_txt2shape_model.py:493-511). K must divide by the mesh
        size (``pack_slots(bucket=n_devices)``).
        """
        cfg = self.cfg
        uc_scale = cfg.diffusion.uc_scale if uc_scale is None else uc_scale
        tables = ddim_tables if ddim_tables is not None else self.ddim_tables
        k_z, k_noise = jax.random.split(key)

        lay = self.sample_layout(variables, dec, mean_est, cov_chol, k_z)

        gen_sdf = None
        if gen_shape:
            gen_sdf = self._gen_shapes(variables, lay["uc_rel"],
                                       lay["c_rel"], k_noise,
                                       shape_slot_idx, tables, uc_scale,
                                       shared_noise, shape_mask,
                                       sampler=sampler,
                                       slot_sharding=slot_sharding)

        return {"boxes": lay["boxes"], "angles": lay["angles"],
                "sdf": gen_sdf, "z": lay["z"]}

    def sample_layout(self, variables: Dict[str, Any], dec: SceneView,
                      mean_est: jax.Array, cov_chol: jax.Array,
                      k_z: jax.Array) -> Dict[str, jax.Array]:
        """Layout-only stage of :meth:`sample` — latent draw, relation
        encoding, box/angle decode. ``sample`` is exactly
        ``sample_layout(k_z)`` + ``gen_latents(k_noise)`` +
        ``decode_latents`` with ``k_z, k_noise = split(key)``; the eval CLI
        jits the three stages separately (``--staged_sample``) so each
        compiles (and persists to the compile cache) independently — one
        giant sampling program is a ~40-minute single compile on the
        tunneled device, longer than the tunnel's observed stable window."""
        B, N = dec.objs.shape
        eps = jax.random.normal(k_z, (B * N, mean_est.shape[0]))
        z = mean_est[None, :] + eps @ cov_chol.T

        uc_rel, c_rel = self.layout.apply(
            variables["layout"], z, dec, train=False,
            method=LayoutVAE.rel_encode)
        if c_rel is None:
            c_rel = uc_rel

        boxes, angles = self.layout.apply(
            variables["layout"], z, dec, train=False,
            method=LayoutVAE.decode)
        return {"boxes": boxes, "angles": angles, "z": z,
                "uc_rel": uc_rel, "c_rel": c_rel}

    def gen_latents(self, variables, uc_rel, c_rel, k_noise,
                    shape_slot_idx=None, ddim_tables=None,
                    uc_scale: Optional[float] = None,
                    shared_noise: bool = True, sampler: str = "ddim",
                    slot_sharding=None) -> jax.Array:
        """Denoise-only stage: the DDIM/PLMS chain over packed slots,
        WITHOUT the first-stage VQ-VAE decode — returns [K, z³, zc]
        latents for :meth:`decode_latents` (see sample_layout)."""
        cfg = self.cfg
        uc_scale = cfg.diffusion.uc_scale if uc_scale is None else uc_scale
        tables = ddim_tables if ddim_tables is not None else self.ddim_tables
        return self._gen_shapes(variables, uc_rel, c_rel, k_noise,
                                shape_slot_idx, tables, uc_scale,
                                shared_noise, sampler=sampler,
                                slot_sharding=slot_sharding, decode=False)

    def decode_latents(self, variables, samples: jax.Array,
                       slot_sharding=None) -> jax.Array:
        """Decode-only stage of :meth:`sample` (inference-scoped kernel
        lowerings, like the fused program — see sample_layout)."""
        from commonscenes_tpu.nn.conv3d import inference_trace
        with inference_trace(True):
            return self._decode_latents(variables, samples,
                                        slot_sharding=slot_sharding)

    def _gen_shapes(self, variables, uc_rel, c_rel, k_noise,
                    shape_slot_idx, tables, uc_scale, shared_noise,
                    shape_mask=None, sampler: str = "ddim",
                    slot_sharding=None, decode: bool = True):
        """DDIM (or PLMS) chain + VQ-VAE decode over (optionally slot-packed)
        relation tokens (reference rel2shape,
        sdfusion_txt2shape_model.py:460-516; the PLMS sampler ships in the
        reference but is never wired into eval — here it's selectable)."""
        from commonscenes_tpu.nn.conv3d import inference_trace
        # the whole sampling program (denoise scan AND the VQ-VAE decode)
        # is forward-only, so inference-scoped conv lowerings apply to it
        with inference_trace(True):
            return self._gen_shapes_impl(
                variables, uc_rel, c_rel, k_noise, shape_slot_idx, tables,
                uc_scale, shared_noise, shape_mask, sampler, slot_sharding,
                decode)

    def denoise_prep(self, variables, uc_rel, c_rel, k_noise,
                     shape_slot_idx=None, shared_noise: bool = True,
                     slot_sharding=None):
        """The x_T draw + conditioning prep of :meth:`gen_latents`, as its
        own (tiny, fast-compiling) program — the entry half of the
        host-driven denoise loop (see :meth:`denoise_step`). Same key
        split and same ops as the fused chain: ``(x_T, c_in, uc_in,
        k_eta)`` here feed ``S`` :meth:`denoise_step` calls and the result
        is numerically identical to :meth:`gen_latents`."""
        cfg = self.cfg
        if shape_slot_idx is not None:
            c_rel = jnp.take(c_rel, shape_slot_idx, axis=0)
            uc_rel = jnp.take(uc_rel, shape_slot_idx, axis=0)
        K = c_rel.shape[0]
        z_sp, zc = cfg.vqvae.z_spatial, cfg.vqvae.embed_dim
        k_noise, k_eta = jax.random.split(k_noise)
        if shared_noise:
            single = jax.random.normal(k_noise, (1, z_sp, z_sp, z_sp, zc))
            x_T = jnp.tile(single, (K, 1, 1, 1, 1))
        else:
            x_T = jax.random.normal(k_noise, (K, z_sp, z_sp, z_sp, zc))

        if cfg.diffusion.conditioning_key == "concat":
            c_in = c_rel.reshape(K, -1)
            uc_in = uc_rel.reshape(K, -1)
        else:
            c_in, uc_in = c_rel, uc_rel

        if slot_sharding is not None:
            # pin the packed-slot axis to the mesh; GSPMD propagates the
            # sharding through the DDIM scan carries and the decode
            x_T = jax.lax.with_sharding_constraint(x_T, slot_sharding)
            c_in = jax.lax.with_sharding_constraint(c_in, slot_sharding)
            uc_in = jax.lax.with_sharding_constraint(uc_in, slot_sharding)
        return x_T, c_in, uc_in, k_eta

    def _denoiser_fns(self, variables):
        """(denoise_fn, cfg_fn) pair shared by the fused chain and the
        host-driven step."""
        cfg = self.cfg

        def denoise_fn(x, t, c):
            # inference=True: forward-only program → inference-only kernel
            # variants are allowed (ops/fused_transformer ftiled FFN)
            return self.denoiser.apply(variables["df"], x, t, c,
                                       inference=True)

        import os as _os
        cfg_fn = None
        if (cfg.diffusion.conditioning_key == "crossattn"
                and _os.environ.get("COMMONSCENES_CFG_DEDUP", "1") != "0"):
            # CFG-deduped forward: the uncond/cond halves share the
            # context-free UNet prefix (nn/unet3d.py cfg_pair).
            # COMMONSCENES_CFG_DEDUP=0 restores the naive doubled-batch
            # forward for end-to-end A/B.
            def cfg_fn(x, t, c_full):  # noqa: F811
                return self.denoiser.apply(variables["df"], x, t, c_full,
                                           cfg_pair=True, inference=True)
        return denoise_fn, cfg_fn

    def denoise_step(self, variables, x, key, idx, c_in, uc_in,
                     ddim_tables=None, uc_scale: Optional[float] = None,
                     slot_sharding=None):
        """ONE DDIM step of the denoise chain (scan index ``idx``; 0 is
        the t=T step) — the host-loop counterpart of :meth:`gen_latents`.

        Rationale: the compiled DDIM-100 chain is a ~40-minute single
        compile on the tunneled device, longer than the tunnel's stable
        window — the r3/r4 eval chains died mid-compile every attempt.
        One step compiles in minutes and is reused for all ``S`` steps
        (``idx`` is data). Drive it as::

            x, c, uc, key = jit(denoise_prep)(...)
            for i in range(S):
                x, key = jit(denoise_step)(x, key, i, c, uc)

        Numerical parity with the fused scan is pinned by
        tests/test_ddim_host_loop.py. Reference chain:
        samplers/ddim.py:125-179 (itself a python loop per step).
        """
        from commonscenes_tpu.diffusion.ddim import ddim_step
        from commonscenes_tpu.nn.conv3d import inference_trace
        import numpy as _np

        cfg = self.cfg
        uc_scale = cfg.diffusion.uc_scale if uc_scale is None else uc_scale
        tables = ddim_tables if ddim_tables is not None else self.ddim_tables
        if slot_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, slot_sharding)
        with inference_trace(True):
            denoise_fn, cfg_fn = self._denoiser_fns(variables)
            # the fused chain always threads k_eta, so its stochastic
            # predicate reduces to any(sigma != 0) — mirror it exactly
            stoch = bool(_np.any(_np.asarray(tables.sigmas) != 0.0))
            return ddim_step(denoise_fn, tables, x, key, idx, c_in, uc_in,
                             uc_scale=uc_scale, stochastic_eta=stoch,
                             cfg_fn=cfg_fn)

    def _gen_shapes_impl(self, variables, uc_rel, c_rel, k_noise,
                         shape_slot_idx, tables, uc_scale, shared_noise,
                         shape_mask=None, sampler: str = "ddim",
                         slot_sharding=None, decode: bool = True):
        x_T, c_in, uc_in, k_eta = self.denoise_prep(
            variables, uc_rel, c_rel, k_noise, shape_slot_idx,
            shared_noise, slot_sharding)
        denoise_fn, cfg_fn = self._denoiser_fns(variables)

        if sampler == "plms":
            from commonscenes_tpu.diffusion.plms import plms_sample
            samples = plms_sample(denoise_fn, tables, x_T, c_in, uc_in,
                                  uc_scale=uc_scale, cfg_fn=cfg_fn)
        else:
            # eta key always threaded: with ddim_eta=0 the sigma table is
            # all-zero and the stochastic branch compiles away; with eta>0
            # the reference adds sigma_t·noise each step (ddim.py:241-243)
            samples = ddim_sample(denoise_fn, tables, x_T, c_in, uc_in,
                                  uc_scale=uc_scale, cfg_fn=cfg_fn,
                                  eta_noise_key=k_eta)
        if not decode:
            return samples
        gen_sdf = self._decode_latents(variables, samples,
                                       slot_sharding=slot_sharding)
        if shape_mask is not None:
            gen_sdf = gen_sdf * shape_mask.reshape(-1, 1, 1, 1, 1)
        return gen_sdf

    def _decode_latents(self, variables, samples: jax.Array,
                        max_chunk: Optional[int] = None,
                        slot_sharding=None) -> jax.Array:
        """First-stage decode [K, 16³, zc] → [K, 64³, 1], chunked when K is
        large: decoding K×64³ grids at once holds multi-GB activation
        buffers in HBM (the reference minibatches its DDIM+decode at 7 for
        the same reason, sdfusion_txt2shape_model.py:493-511). The chunk
        body compiles once via ``lax.map``.

        With ``slot_sharding`` (object-sharded latency mode) the chunked
        reshape [K]→[K/chunk, chunk] would otherwise strip GSPMD's slot
        sharding — the compiler gathers the latents and decodes replicated.
        The chunk size is rounded up to a mesh multiple and the sharding is
        re-pinned on every chunk and on the result, so each device decodes
        only its own slots."""
        if max_chunk is None:
            import os
            max_chunk = int(os.environ.get("COMMONSCENES_DECODE_CHUNK",
                                           "16"))
        if slot_sharding is not None:
            n_dev = slot_sharding.mesh.devices.size
            max_chunk = max(max_chunk, n_dev)
            max_chunk += (-max_chunk) % n_dev
        K = samples.shape[0]
        if K <= max_chunk:
            out = self.vqvae.apply(variables["vqvae"], samples,
                                   method=VQVAE3D.decode_no_quant)
            if slot_sharding is not None:
                out = jax.lax.with_sharding_constraint(out, slot_sharding)
            return out
        # pad to a chunk multiple so the HBM guard holds for ANY K
        pad = (-K) % max_chunk
        if pad:
            samples = jnp.concatenate(
                [samples, jnp.zeros((pad,) + samples.shape[1:],
                                    samples.dtype)], axis=0)
        chunks = samples.reshape(((K + pad) // max_chunk, max_chunk)
                                 + samples.shape[1:])

        def body(c):
            if slot_sharding is not None:
                c = jax.lax.with_sharding_constraint(c, slot_sharding)
            out = self.vqvae.apply(variables["vqvae"], c,
                                   method=VQVAE3D.decode_no_quant)
            if slot_sharding is not None:
                out = jax.lax.with_sharding_constraint(out, slot_sharding)
            return out

        out = jax.lax.map(body, chunks)
        out = out.reshape((K + pad,) + out.shape[2:])[:K]
        if slot_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, slot_sharding)
        return out

    # ------------------------------------------------------------------
    # manipulation-mode eval (reference decoder_with_changes / _additions +
    # shape regeneration, VAEGAN_V2FULL.py:332-396, used by
    # scripts/eval_3dfront.py:280,306)
    # ------------------------------------------------------------------

    def manipulate_sample(self, variables: Dict[str, Any], batch: GraphBatch,
                          key: jax.Array, gen_shape: bool = True,
                          shape_slot_idx: Optional[jax.Array] = None,
                          ddim_tables=None, uc_scale: Optional[float] = None,
                          shared_noise: bool = True, sampler: str = "ddim"):
        """Encode the (unchanged) encoder view, apply the manipulation GCN
        for the changed/added nodes, decode boxes/angles — and, with
        ``gen_shape``, regenerate SDFs for the (packed) real slots with DDIM
        conditioned on the post-manipulation relation tokens — exactly the
        reference's eval path for --manipulation modes."""
        cfg = self.cfg
        uc_scale = cfg.diffusion.uc_scale if uc_scale is None else uc_scale
        tables = ddim_tables if ddim_tables is not None else self.ddim_tables
        k_layout, k_noise = jax.random.split(key)

        layout_out = self.manipulate_layout(variables, batch, k_layout)

        gen_sdf = None
        if gen_shape:
            gen_sdf = self._gen_shapes(variables, layout_out["uc_rel"],
                                       layout_out["c_rel"], k_noise,
                                       shape_slot_idx, tables, uc_scale,
                                       shared_noise, sampler=sampler)
        return {"boxes": layout_out["boxes"], "angles": layout_out["angles"],
                "sdf": gen_sdf, "keep": batch.keep_mask.reshape(-1)}

    def manipulate_layout(self, variables: Dict[str, Any],
                          batch: GraphBatch, k_layout: jax.Array):
        """Layout-only stage of :meth:`manipulate_sample` (GT-encode +
        manipulation GCN + box/angle decode). Same staging contract as
        :meth:`sample_layout`: ``manipulate_sample`` is exactly
        ``manipulate_layout(k_layout)`` + ``gen_latents(k_noise)`` +
        ``decode_latents`` with ``k_layout, k_noise = split(key)`` — and
        the staged denoise/decode programs are byte-identical to the
        no-manipulation ones, so the compile cache serves both."""
        layout_out = dict(self.layout.apply(
            variables["layout"], batch.enc, batch.dec, batch.node_new,
            batch.node_changed, k_layout, train=False))
        if layout_out.get("c_rel") is None:
            layout_out["c_rel"] = layout_out["uc_rel"]
        return layout_out

    # ------------------------------------------------------------------
    # train-set latent statistics (reference collect_train_statistics,
    # VAEGAN_V2FULL.py:700-760)
    # ------------------------------------------------------------------

    def encode_means(self, variables, enc: SceneView) -> Tuple[np.ndarray, np.ndarray]:
        mu, _ = self.layout.apply(variables["layout"], enc, train=False,
                                  method=LayoutVAE.encode)
        mask = np.asarray(enc.obj_mask).reshape(-1) > 0
        return np.asarray(mu)[mask], mask
