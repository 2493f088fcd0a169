"""Style/material consistency metric.

Capability parity with reference scripts/consistency_check.py:1-107: for
object pairs connected by 'same style as' / 'same material as' /
'same super category as' edges, measure (a) appearance-feature cosine
similarity and (b) shape chamfer distance — consistent generations should
score high/low respectively.

The reference encodes rendered object crops with CLIP's image tower
(downloads unavailable here); the feature hook is pluggable with the same
fallback policy as eval/fid.py: top-down render patch features by default.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.eval.fid import random_patch_features
from commonscenes_tpu.eval.scene_export import render_topdown
from commonscenes_tpu.ops.chamfer import chamfer_distance
from commonscenes_tpu.ops.mesh import sdf_to_point_cloud, sdf_to_vertex_cloud

CONSISTENCY_PREDICATES = ("same style as", "same material as",
                          "same super category as")


def consistency_pairs(triples: np.ndarray, pred_idx_to_name: Sequence[str],
                      triple_mask: Optional[np.ndarray] = None
                      ) -> List[Tuple[int, int]]:
    triples = np.asarray(triples).reshape(-1, 3)
    if triple_mask is not None:
        triples = triples[np.asarray(triple_mask).reshape(-1) > 0]
    out = []
    for s, p, o in triples:
        if pred_idx_to_name[p] in CONSISTENCY_PREDICATES:
            out.append((int(s), int(o)))
    return out


def object_appearance_features(sdfs: np.ndarray,
                               extractor: Optional[Callable] = None,
                               n_points: int = 4096) -> np.ndarray:
    """Embed a top-down point-splat of each object's surface.

    Point splatting (height as z-buffer) is O(points) regardless of mesh
    complexity — raw generated SDFs can triangulate to millions of faces.
    """
    from commonscenes_tpu.ops.mesh import sdf_to_point_cloud
    extract = extractor or random_patch_features
    imgs = []
    res = 64
    for k in range(sdfs.shape[0]):
        pts = sdf_to_point_cloud(np.asarray(sdfs[k]), n_points, level=0.02,
                                 rng=np.random.RandomState(k),
                                 normalize=False)
        img = np.ones((res, res, 3), np.float32)
        if len(pts):
            xi = np.clip(((pts[:, 0] + 0.6) / 1.2 * res).astype(int), 0, res - 1)
            zi = np.clip(((pts[:, 2] + 0.6) / 1.2 * res).astype(int), 0, res - 1)
            shade = 0.2 + 0.6 * np.clip((pts[:, 1] + 0.5), 0, 1)
            order = np.argsort(pts[:, 1])          # highest last wins
            img[xi[order], zi[order]] = shade[order, None]
        imgs.append(img)
    return extract(np.stack(imgs))


def consistency_scores(sdfs: np.ndarray, triples: np.ndarray,
                       pred_idx_to_name: Sequence[str],
                       triple_mask: Optional[np.ndarray] = None,
                       n_points: int = 2048,
                       use_pallas: bool = True) -> Dict[str, float]:
    """Mean appearance cosine + mean chamfer over consistency-linked pairs."""
    pairs = consistency_pairs(triples, pred_idx_to_name, triple_mask)
    if not pairs:
        return {"consistency_pairs": 0}

    feats = object_appearance_features(sdfs)
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-9)

    # the reference chamfer compares RAW canonical-frame mesh vertices —
    # no normalization, torch.manual_seed(47) re-seeded per object
    # (consistency_check.py:68-79); object_meshes are exported before the
    # box fit (util.py:317 vs :320) so both live in the [-0.5,0.5] frame
    clouds = np.stack([sdf_to_vertex_cloud(np.asarray(sdfs[k]), n_points,
                                           rng=np.random.RandomState(47),
                                           normalize=None)
                       for k in range(sdfs.shape[0])])
    s_idx = np.asarray([p[0] for p in pairs])
    o_idx = np.asarray([p[1] for p in pairs])
    cos = float(np.mean(np.sum(feats[s_idx] * feats[o_idx], axis=1)))
    cd = np.asarray(chamfer_distance(jnp.asarray(clouds[s_idx]),
                                     jnp.asarray(clouds[o_idx]), use_pallas))
    return {"consistency_pairs": len(pairs),
            "consistency_feature_cos": cos,
            "consistency_chamfer": float(cd.mean())}
