"""Synthetic SG-FRONT-like scene generator.

Produces geometrically self-consistent random scenes (boxes whose pairwise
relations actually satisfy the predicate semantics checked by
eval/constraints.py) so the full train/eval/bench stack runs without the
SG-FRONT download. Box parameters follow the reference convention
(size ℓ=box[0..2] as (x,y,z) extents, center c=box[3..5]; predicates per
helpers/metrics_3dfront.py:57-179), normalized with the published bedroom
statistics (helpers/util.py:519-533).

SDF grids are analytic truncated box/sphere SDFs — cheap, watertight, and
decodable by marching cubes for the eval pipeline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from commonscenes_tpu.data.collate import RawScene
from commonscenes_tpu.data.vocab import Vocab

# published SG-FRONT bedroom box stats (helpers/util.py:519-533)
BOX_MEAN = np.array([1.3827214, 1.309359, 0.9488993, -0.12464812, 0.6188591,
                     -0.54847], np.float32)
BOX_STD = np.array([1.7797655, 1.657638, 0.8501885, 1.9160025, 2.0038228,
                    0.70099753], np.float32)
BOX_SCALE = 3.0


def normalize_boxes(boxes: np.ndarray, mean: Optional[np.ndarray] = None,
                    std: Optional[np.ndarray] = None) -> np.ndarray:
    """z-score × scale, per-split stats (reference helpers/util.py:519-533;
    defaults = the published bedroom constants)."""
    mean = BOX_MEAN if mean is None else mean
    std = BOX_STD if std is None else std
    return BOX_SCALE * (boxes - mean) / std


def denormalize_boxes(boxes: np.ndarray, mean: Optional[np.ndarray] = None,
                      std: Optional[np.ndarray] = None) -> np.ndarray:
    """Inverse of normalize_boxes (reference helpers/util.py:536-562). Eval
    must pass the *dataset's* per-split stats — bedroom constants are only
    correct for bedroom/synthetic data."""
    mean = BOX_MEAN if mean is None else mean
    std = BOX_STD if std is None else std
    return boxes * std / BOX_SCALE + mean


def sphere_sdf(res: int, radius: float, trunc: float = 0.2) -> np.ndarray:
    g = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt(x ** 2 + y ** 2 + z ** 2) - radius
    return np.clip(d, -trunc, trunc)


def box_sdf(res: int, half_extents, trunc: float = 0.2) -> np.ndarray:
    g = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    q = np.stack([np.abs(x) - half_extents[0], np.abs(y) - half_extents[1],
                  np.abs(z) - half_extents[2]], -1)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return np.clip(outside + inside, -trunc, trunc)


def _relation_between(box_s, box_o, vocab: Vocab, rng) -> Optional[int]:
    """Pick one predicate that truly holds between two (denormalized) boxes
    using the metric thresholds from helpers/metrics_3dfront.py:57-179."""
    cands = []
    ls, cs = box_s[:3], box_s[3:]
    lo, co = box_o[:3], box_o[3:]
    if cs[2] - co[2] < -0.05:
        cands.append("left")
    if cs[2] - co[2] > 0.05:
        cands.append("right")
    if cs[0] - co[0] > 0.05:
        cands.append("front")
    if cs[0] - co[0] < -0.05:
        cands.append("behind")
    vs, vo = np.prod(ls), np.prod(lo)
    if vs > 0 and (vs - vo) / vs >= 0.15:
        cands.append("bigger than")
    if vs > 0 and (vs - vo) / vs <= -0.15:
        cands.append("smaller than")
    hs, ho = cs[1] + ls[1], co[1] + lo[1]
    if hs > 0 and (hs - ho) / hs >= 0.1:
        cands.append("taller than")
    if hs > 0 and (hs - ho) / hs <= -0.1:
        cands.append("shorter than")
    if not cands:
        return None
    name = cands[int(rng.randint(len(cands)))]
    return vocab.pred_to_idx[name]


def make_scene(vocab: Vocab, rng: np.random.RandomState, num_objs: int = 8,
               max_triples_per_pair: int = 1, sdf_res: int = 0,
               clip_dim: int = 512, with_clip: bool = True,
               scan_id: str = "synthetic") -> RawScene:
    """Build one scene: num_objs furniture + a '_scene_' root with 'in'
    edges (threedfront_dataset.py:448-459)."""
    root = vocab.scene_class_id
    furn = [c for c in range(vocab.num_obj_classes) if c != root]
    objs = np.asarray(
        [int(rng.choice(furn)) for _ in range(num_objs)] + [root], np.int32)
    n = num_objs + 1

    sizes = rng.uniform(0.2, 1.5, size=(num_objs, 3)).astype(np.float32)
    centers = np.stack([
        rng.uniform(-2.0, 2.0, num_objs),
        rng.uniform(0.0, 1.5, num_objs),
        rng.uniform(-2.0, 2.0, num_objs),
    ], 1).astype(np.float32)
    boxes = np.concatenate([sizes, centers], 1)
    # root node gets the scene bound
    boxes = np.concatenate(
        [boxes, np.array([[4.0, 3.0, 4.0, 0.0, 1.5, 0.0]], np.float32)], 0)
    angles = rng.randint(0, 24, size=n).astype(np.int32)
    angles[-1] = 0

    triples: List[List[int]] = []
    for i in range(num_objs):
        for j in range(num_objs):
            if i == j or rng.rand() > 0.35:
                continue
            p = _relation_between(boxes[i], boxes[j], vocab, rng)
            if p is not None:
                triples.append([i, p, j])
    for i in range(num_objs):   # root edges: obj --in--> _scene_
        triples.append([i, 0, n - 1])
    triples_arr = np.asarray(triples, np.int32).reshape(-1, 3)

    text_feats = rel_feats = None
    if with_clip:
        # deterministic pseudo-CLIP features per class / per triple text
        text_feats = np.stack([_pseudo_clip(f"cls{int(c)}", clip_dim)
                               for c in objs])
        rel_feats = np.stack([
            _pseudo_clip(f"{int(objs[s])}-{int(p)}-{int(objs[o])}", clip_dim)
            for s, p, o in triples_arr]) if len(triples_arr) else \
            np.zeros((0, clip_dim), np.float32)

    sdfs = has_sdf = None
    if sdf_res:
        sdfs = np.zeros((n, sdf_res, sdf_res, sdf_res), np.float32)
        has_sdf = np.zeros(n, bool)
        for i in range(num_objs):
            if rng.rand() < 0.5:
                sdfs[i] = sphere_sdf(sdf_res, float(rng.uniform(0.3, 0.8)))
            else:
                sdfs[i] = box_sdf(sdf_res, rng.uniform(0.3, 0.8, 3))
            has_sdf[i] = True

    return RawScene(objs=objs,
                    objs_grained=objs.copy(),
                    triples=triples_arr,
                    boxes=normalize_boxes(boxes),
                    angles=angles,
                    text_feats=text_feats,
                    rel_feats=rel_feats,
                    sdfs=sdfs,
                    has_sdf=has_sdf,
                    scan_id=scan_id)


def _pseudo_clip(text: str, dim: int) -> np.ndarray:
    # sha1, NOT hash(): Python's salted hash changes per process, which
    # would silently swap every conditioning feature between a train run
    # and a later eval run (same scheme as data/clip_cache.py)
    import hashlib
    seed = int(hashlib.sha1(text.encode()).hexdigest()[:8], 16)
    r = np.random.RandomState(seed)
    v = r.randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


class SyntheticDataset:
    """Iterable synthetic dataset with the reader interface used by the
    CLI/train loop."""

    def __init__(self, vocab: Optional[Vocab] = None, num_scenes: int = 64,
                 num_objs_range=(4, 10), sdf_res: int = 0, seed: int = 0,
                 clip_dim: int = 512, with_clip: bool = True):
        self.vocab = vocab or Vocab.synthetic()
        self.num_scenes = num_scenes
        self.num_objs_range = num_objs_range
        self.sdf_res = sdf_res
        self.clip_dim = clip_dim
        self.with_clip = with_clip
        self._seed = seed
        # dataset-level normalization stats (synthetic scenes are generated
        # with the bedroom constants)
        self.box_mean = BOX_MEAN
        self.box_std = BOX_STD

    def __len__(self):
        return self.num_scenes

    def __getitem__(self, idx: int) -> RawScene:
        rng = np.random.RandomState(self._seed * 100003 + idx)
        n = rng.randint(self.num_objs_range[0], self.num_objs_range[1] + 1)
        return make_scene(self.vocab, rng, num_objs=n, sdf_res=self.sdf_res,
                          clip_dim=self.clip_dim, with_clip=self.with_clip,
                          scan_id=f"synthetic-{idx}")
