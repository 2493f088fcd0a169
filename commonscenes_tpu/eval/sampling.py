"""Batched, mesh-shardable evaluation sampling utilities.

Replaces the reference's per-scene batch-1 eval loop
(scripts/eval_3dfront.py:444-530: one encoder/DDIM call per scene with host
syncs in between) with:

* full-train-set latent statistics in jitted batches
  (reference model/VAE.py:160-191 collect over the entire train loader);
* multi-scene sampling: B scenes per jit call, shape slots packed across the
  whole batch into a bucketed static budget so DDIM runs at the number of
  real furniture objects, not B·max_objs;
* optional `jax.sharding.Mesh` data-parallel execution — batches are sharded
  on the data axis, XLA inserts the collectives (the packed-slot gather
  rides ICI as a small all-gather of relation tokens).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pack_slots(objs: np.ndarray, obj_mask: np.ndarray, scene_class_id: int,
               bucket: int = 16, cap: Optional[int] = None
               ) -> Tuple[np.ndarray, int]:
    """Flat indices (into B·N) of real furniture slots, padded to a bucketed
    static size.

    Returns (slots_padded [K], n_real). K is the smallest multiple of
    ``bucket`` ≥ n_real (≤ cap) so distinct batches reuse a handful of
    compiled DDIM programs instead of one per count. Padding repeats slot 0
    (its samples are discarded via n_real).
    """
    objs_row = np.asarray(objs).reshape(-1)
    mask_row = np.asarray(obj_mask).reshape(-1) > 0
    slots = np.where(mask_row & (objs_row != scene_class_id))[0]
    n_real = len(slots)
    K = max(bucket, int(np.ceil(max(n_real, 1) / bucket)) * bucket)
    if cap is not None:
        K = min(K, cap)
    slots = slots[:K]
    pad = np.zeros(K - len(slots), np.int64)
    return np.concatenate([slots, pad]).astype(np.int32), min(n_real, K)


def collect_latent_stats(encode_fn, dataset, vocab, batch_cfg, rng,
                         use_clip: bool, batch_size: int = 16,
                         limit: Optional[int] = None,
                         collate_kwargs: Optional[dict] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """mean/cov of encoder means over the (full) train split.

    ``encode_fn(enc_view) -> (mu [B·N, D], ...)`` should be jitted once by
    the caller; scenes are collated in fixed-size batches so the whole pass
    reuses one compiled program (reference collect_train_statistics,
    model/VAEGAN_V2FULL.py:700-760, walks the entire train loader).
    """
    from commonscenes_tpu.data.collate import collate

    n = len(dataset) if limit is None else min(limit, len(dataset))
    cfg = batch_cfg.__class__(
        batch_size=batch_size, max_objs=batch_cfg.max_objs,
        max_triples=batch_cfg.max_triples,
        diffusion_bs=batch_cfg.diffusion_bs, sdf_res=batch_cfg.sdf_res)
    kw = collate_kwargs or {}

    mus = []
    for start in range(0, n, batch_size):
        idx = [min(i, n - 1) for i in range(start, start + batch_size)]
        scenes = [dataset[i] for i in idx]
        b = collate(scenes, vocab, cfg, rng, use_clip=use_clip, **kw)
        mu = np.asarray(encode_fn(b.enc))
        mask = np.asarray(b.enc.obj_mask).reshape(-1) > 0
        # drop the duplicated tail scenes of the last (ragged) batch
        valid_scenes = min(batch_size, n - start)
        scene_of_row = np.repeat(np.arange(batch_size), cfg.max_objs)
        mus.append(mu[mask & (scene_of_row < valid_scenes)])
    mu_cat = np.concatenate(mus, 0)
    mean_est = mu_cat.mean(0)
    cov_est = np.cov((mu_cat - mean_est).T)
    return mean_est, cov_est


def make_eval_mesh(min_batch: int):
    """A data mesh for eval when the batch is shardable, else None."""
    import jax
    from commonscenes_tpu.parallel.mesh import make_mesh
    n = jax.device_count()
    if n > 1 and min_batch % n == 0:
        return make_mesh(n)
    return None
