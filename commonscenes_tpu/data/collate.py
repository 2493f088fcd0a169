"""Host-side padding collate: raw scenes → static-shape GraphBatch.

Replaces the reference's ragged flattened-graph collate + in-model node
surgery (dataset/threedfront_dataset.py:693-828, model/VAEGAN_V2FULL.py:
480-508) with fixed (max_objs, max_triples) padding and mask construction,
including the three manipulation modes (none / relationship change / node
addition, threedfront_dataset.py:512-550) and the class-balanced SDF
selection for the shape branch (VAEGAN_V2FULL.py:398-463).

Everything here is numpy on the host; the output arrays feed directly into
the jitted train/eval steps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from commonscenes_tpu.core.config import BatchConfig
from commonscenes_tpu.core.graph import GraphBatch, SceneView, ShapeBatch
from commonscenes_tpu.data.vocab import INTERPRETABLE_REL_IDS, Vocab


@dataclass
class RawScene:
    """One unpadded scene as produced by a dataset reader."""

    objs: np.ndarray            # i32 [n] coarse class ids
    objs_grained: np.ndarray    # i32 [n]
    triples: np.ndarray         # i32 [m, 3]
    boxes: np.ndarray           # f32 [n, 6] normalized
    angles: np.ndarray          # i32 [n] bins
    text_feats: Optional[np.ndarray] = None   # [n, 512]
    rel_feats: Optional[np.ndarray] = None    # [m, 512]
    sdfs: Optional[np.ndarray] = None         # f32 [n, R, R, R] or None
    has_sdf: Optional[np.ndarray] = None      # bool [n]
    scan_id: str = ""
    instance_ids: Optional[np.ndarray] = None  # i32 [n] dataset instance ids
                                               # (root/synthetic slots: -1)
    points: Optional[np.ndarray] = None        # f32 [n, P, 3] per-object
                                               # point sets (legacy 3RScan
                                               # use_points path; scene root
                                               # slot is zeros)
    shape_feats: Optional[np.ndarray] = None   # f32 [n, D] per-instance
                                               # DeepSDF/AtlasNet latents
                                               # (legacy with_feats path;
                                               # scene root slot is zeros)

    @property
    def num_objs(self) -> int:
        return int(self.objs.shape[0])


@dataclass
class ManipulationResult:
    mode: str                       # 'none' | 'relationship' | 'addition'
    node_new: np.ndarray            # f32 [N]
    node_changed: np.ndarray        # f32 [N]
    enc_obj_keep: np.ndarray        # bool [n] encoder-visible nodes
    enc_triples: np.ndarray         # i32 [m_enc, 3] encoder-view triples
    enc_rel_feats: Optional[np.ndarray]
    changed_triple_idx: int = -1
    # decoder-view overrides (copy-on-write; the input RawScene is never
    # mutated so caching datasets / reused batches stay correct)
    dec_triples: Optional[np.ndarray] = None
    dec_rel_feats: Optional[np.ndarray] = None


def _scene_root_edges(scene: RawScene, scene_class_id: int) -> np.ndarray:
    """Indices of the '_scene_' root node triples are already in the raw
    triples (readers add them); helper for manipulation exclusions."""
    return np.where(scene.objs == scene_class_id)[0]


def apply_manipulation(scene: RawScene, vocab: Vocab, mode: str,
                       rng: np.random.RandomState,
                       clip_cache=None) -> ManipulationResult:
    """Derive encoder-view edits from the decoder-view scene.

    'addition': hide one non-root node from the encoder (the decoder keeps
    it → the model must hallucinate it). 'relationship': flip one
    interpretable predicate in the DECODER view; the encoder keeps the
    original. 'none': views identical.
    """
    n, m = scene.num_objs, scene.triples.shape[0]
    node_new = np.zeros(n, np.float32)
    node_changed = np.zeros(n, np.float32)
    enc_keep = np.ones(n, bool)
    enc_triples = scene.triples
    enc_rel_feats = scene.rel_feats
    dec_triples = None
    dec_rel_feats = None
    root = vocab.scene_class_id
    changed_idx = -1

    candidates = [i for i in range(n) if scene.objs[i] != root]

    if mode == "addition" and len(candidates) > 1:
        hide = int(rng.choice(candidates))
        node_new[hide] = 1.0
        enc_keep[hide] = False
        keep_t = ~((scene.triples[:, 0] == hide) | (scene.triples[:, 2] == hide))
        enc_triples = scene.triples[keep_t]
        if enc_rel_feats is not None:
            enc_rel_feats = enc_rel_feats[keep_t]
    elif mode == "relationship" and m > 0:
        # choose an interpretable, non-root triple; change the DEC predicate
        ok = []
        for k in range(m):
            s, p, o = scene.triples[k]
            if p in INTERPRETABLE_REL_IDS and scene.objs[s] != root \
                    and scene.objs[o] != root:
                ok.append(k)
        if ok:
            k = int(rng.choice(ok))
            changed_idx = k
            s, p, o = scene.triples[k]
            new_p = vocab.inverse_pred_id(int(p))
            if new_p == p:
                others = [q for q in INTERPRETABLE_REL_IDS if q != p]
                new_p = int(rng.choice(others))
            # encoder keeps the original predicate; decoder gets the new one
            # (copy-on-write: the RawScene itself stays untouched)
            dec_triples = scene.triples.copy()
            dec_triples[k, 1] = new_p
            node_changed[s] = 1.0
            node_changed[o] = 1.0
            if scene.rel_feats is not None and clip_cache is not None:
                dec_rel_feats = scene.rel_feats.copy()
                dec_rel_feats[k] = clip_cache.relation_feature(
                    vocab, int(scene.objs[s]), new_p, int(scene.objs[o]))
    return ManipulationResult(mode, node_new, node_changed, enc_keep,
                              enc_triples, enc_rel_feats, changed_idx,
                              dec_triples=dec_triples,
                              dec_rel_feats=dec_rel_feats)


def _pad_view(objs, objs_grained, triples, boxes, angles, text_feats,
              rel_feats, N: int, T: int, clip_dim: int, use_clip: bool):
    n = objs.shape[0]
    m = triples.shape[0]
    if n > N:
        raise ValueError(f"scene has {n} objects > max_objs={N}")
    if m > T:
        # overflow (rare; graphs are small): keep every scene-root 'in'
        # edge (predicate 0, appended last by the readers — they carry the
        # scene conditioning) and the earliest inter-object edges
        is_root = triples[:, 1] == 0
        order = np.sort(np.concatenate(
            [np.where(is_root)[0], np.where(~is_root)[0]])[:T])
        triples = triples[order]
        if rel_feats is not None:
            rel_feats = rel_feats[order]
        m = T

    def pad0(a, total, axis=0):
        width = [(0, 0)] * a.ndim
        width[axis] = (0, total - a.shape[axis])
        return np.pad(a, width)

    view = dict(
        objs=pad0(objs.astype(np.int32), N),
        objs_grained=pad0(objs_grained.astype(np.int32), N),
        obj_mask=pad0(np.ones(n, np.float32), N),
        triples=pad0(triples.astype(np.int32), T),
        triple_mask=pad0(np.ones(m, np.float32), T),
        boxes=pad0(boxes.astype(np.float32), N),
        angles=pad0(angles.astype(np.int32), N),
    )
    if use_clip:
        tf = text_feats if text_feats is not None else np.zeros((n, clip_dim), np.float32)
        rf = rel_feats if rel_feats is not None else np.zeros((m, clip_dim), np.float32)
        view["text_feats"] = pad0(tf.astype(np.float32), N)
        view["rel_feats"] = pad0(rf.astype(np.float32), T)
    else:
        view["text_feats"] = None
        view["rel_feats"] = None
    return view


def select_sdfs(scenes: Sequence[RawScene], manips: Sequence[ManipulationResult],
                cfg: BatchConfig, rng: np.random.RandomState) -> ShapeBatch:
    """Class-balanced per-scene SDF pick (reference balance_objects +
    select_sdfs, VAEGAN_V2FULL.py:398-463): ceil(diffusion_bs / B) objects
    per scene, preferring distinct fine-grained classes, truncated to
    diffusion_bs total."""
    B = len(scenes)
    per_scene = int(np.ceil(cfg.diffusion_bs / B))
    picks: List[tuple] = []
    for si, scene in enumerate(scenes):
        if scene.has_sdf is None:
            continue
        ids = np.where(scene.has_sdf)[0]
        if len(ids) == 0:
            continue
        grained = scene.objs_grained[ids]
        uniq = np.unique(grained)
        if len(uniq) >= per_scene:
            chosen_g = rng.choice(uniq, size=per_scene, replace=False)
        else:
            extra = rng.choice(grained, size=per_scene - len(uniq), replace=True)
            chosen_g = np.concatenate([uniq, extra])
        for g in chosen_g:
            pool = ids[grained == g]
            picks.append((si, int(rng.choice(pool))))

    picks = picks[:cfg.diffusion_bs]
    S = cfg.diffusion_bs
    R = cfg.sdf_res
    scene_idx = np.zeros(S, np.int32)
    slot_idx = np.zeros(S, np.int32)
    mask = np.zeros(S, np.float32)
    obj_class = np.zeros(S, np.int32)
    # clamp+pad through the native host kernel (numpy fallback inside)
    from commonscenes_tpu.data.native import clamp_pad_sdf
    if picks:
        src = np.stack([scenes[si].sdfs[oi] for si, oi in picks])
    else:
        src = np.zeros((0, R, R, R), np.float32)
    sel = np.concatenate([np.arange(len(picks), dtype=np.int32),
                          np.full(S - len(picks), -1, np.int32)])
    sdf = clamp_pad_sdf(src, sel, S, cfg.trunc_thres)
    for i, (si, oi) in enumerate(picks):
        scene_idx[i] = si
        slot_idx[i] = oi
        mask[i] = 1.0
        obj_class[i] = scenes[si].objs[oi]
    return ShapeBatch(sdf=sdf, scene_idx=scene_idx, slot_idx=slot_idx,
                      mask=mask, obj_class=obj_class)


def collate(scenes: Sequence[RawScene], vocab: Vocab, cfg: BatchConfig,
            rng: np.random.RandomState, use_clip: bool = True,
            clip_dim: int = 512, manipulation_modes: Sequence[str] = ("none",),
            with_shapes: bool = False, clip_cache=None) -> GraphBatch:
    """Pad + stack a list of RawScenes into one GraphBatch."""
    N, T = cfg.max_objs, cfg.max_triples
    enc_views: List[dict] = []
    dec_views: List[dict] = []
    node_new = np.zeros((len(scenes), N), np.float32)
    node_changed = np.zeros((len(scenes), N), np.float32)
    manips: List[ManipulationResult] = []

    for bi, scene in enumerate(scenes):
        mode = manipulation_modes[bi % len(manipulation_modes)]
        man = apply_manipulation(scene, vocab, mode, rng, clip_cache)
        manips.append(man)

        dec_triples = (man.dec_triples if man.dec_triples is not None
                       else scene.triples)
        dec_rel_feats = (man.dec_rel_feats if man.dec_rel_feats is not None
                         else scene.rel_feats)
        dec = _pad_view(scene.objs, scene.objs_grained, dec_triples,
                        scene.boxes, scene.angles, scene.text_feats,
                        dec_rel_feats, N, T, clip_dim, use_clip)
        enc = _pad_view(scene.objs, scene.objs_grained, man.enc_triples,
                        scene.boxes, scene.angles, scene.text_feats,
                        man.enc_rel_feats, N, T, clip_dim, use_clip)
        enc["obj_mask"][:scene.num_objs] = man.enc_obj_keep.astype(np.float32)
        node_new[bi, :scene.num_objs] = man.node_new
        node_changed[bi, :scene.num_objs] = man.node_changed
        enc_views.append(enc)
        dec_views.append(dec)

    def stack(views, key):
        if views[0][key] is None:
            return None
        return np.stack([v[key] for v in views])

    def to_view(views) -> SceneView:
        return SceneView(
            objs=stack(views, "objs"),
            objs_grained=stack(views, "objs_grained"),
            obj_mask=stack(views, "obj_mask"),
            triples=stack(views, "triples"),
            triple_mask=stack(views, "triple_mask"),
            boxes=stack(views, "boxes"),
            angles=stack(views, "angles"),
            text_feats=stack(views, "text_feats"),
            rel_feats=stack(views, "rel_feats"),
        )

    shapes = None
    if with_shapes:
        shapes = select_sdfs(scenes, manips, cfg, rng)

    return GraphBatch(enc=to_view(enc_views), dec=to_view(dec_views),
                      node_new=node_new, node_changed=node_changed,
                      shapes=shapes)
