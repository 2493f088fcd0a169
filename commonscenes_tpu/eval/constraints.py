"""Scene-graph constraint accuracy (the paper's SCA metric).

Capability parity with reference helpers/metrics_3dfront.py:57-179
(validate_constrains) and :182-311 (validate_constrains_changes): geometric
rule checks per predicate with identical thresholds —

  left/right:  Δz ±0.05 (+ strict: 3D overlap-over-min-volume < 0.3)
  front/behind: Δx ±0.05 (+ strict IoU check)
  bigger/smaller: relative volume ±15%
  taller/shorter: absolute top height ±10%
  standing on: |Δy_bottom| < 0.04
  close by: min corner-pair distance < 0.45
  symmetrical to: flipped-center distance < 0.45 (any of x/z/xz flips)

Box convention (metrics_3dfront.py:314-334): box = [l(z-extent), h(y-extent),
w(x-extent), px, py(bottom), pz]. The reference iterates triples in python;
here everything is vectorized numpy over all triples at once — the "IoU" is
closed-form for the axis-aligned param6 boxes (intersection over MIN volume,
metrics_3dfront.py:367).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

RULE_NAMES = ["left", "right", "front", "behind", "bigger", "smaller",
              "taller", "shorter", "standing on", "close by",
              "symmetrical to"]


def angular_distance(a_deg: float, b_deg: float) -> float:
    """Smallest angle between two headings in degrees
    (reference helpers/metrics_3dfront.py angular helpers)."""
    d = abs(a_deg - b_deg) % 360.0
    return 360.0 - d if d > 180.0 else d


def estimate_angular_mean(degs) -> float:
    """Circular mean (metrics_3dfront.py:40-42)."""
    rad = np.deg2rad(np.asarray(degs, np.float64))
    m = float(np.rad2deg(np.arctan2(np.sin(rad).sum(),
                                    np.cos(rad).sum())) % 360.0)
    return 0.0 if m >= 360.0 - 1e-9 else m


def estimate_angular_std(degs) -> float:
    """Circular std around the circular mean (metrics_3dfront.py:44-48)."""
    degs = np.asarray(degs, np.float64)
    m = estimate_angular_mean(degs)
    d = np.asarray([angular_distance(x, m) for x in degs])
    return float(np.sqrt((d ** 2).mean()))

# predicate-name → rule key (predicate list order from data.vocab.PREDICATES)
PRED_TO_RULE = {
    "left": "left", "right": "right", "front": "front", "behind": "behind",
    "bigger than": "bigger", "smaller than": "smaller",
    "taller than": "taller", "shorter than": "shorter",
    "standing on": "standing on", "close by": "close by",
    "symmetrical to": "symmetrical to",
}


def aabb_overlap_over_min(box_s: np.ndarray, box_o: np.ndarray) -> np.ndarray:
    """Vectorized intersection / min-volume for axis-aligned param6 boxes
    (equivalent to box3d_iou with param6=True, metrics_3dfront.py:337-371)."""
    # extents per axis: x=w=box[2], y=h=box[1], z=l=box[0]
    def axis_overlap(cs, co, es, eo):
        lo = np.maximum(cs - es / 2, co - eo / 2)
        hi = np.minimum(cs + es / 2, co + eo / 2)
        return np.maximum(hi - lo, 0.0)

    ox = axis_overlap(box_s[:, 3], box_o[:, 3], box_s[:, 2], box_o[:, 2])
    oz = axis_overlap(box_s[:, 5], box_o[:, 5], box_s[:, 0], box_o[:, 0])
    # y: boxes sit on their bottom (y ∈ [py, py+h])
    ylo = np.maximum(box_s[:, 4], box_o[:, 4])
    yhi = np.minimum(box_s[:, 4] + box_s[:, 1], box_o[:, 4] + box_o[:, 1])
    oy = np.maximum(yhi - ylo, 0.0)
    inter = ox * oy * oz
    vol_s = np.abs(box_s[:, 0] * box_s[:, 1] * box_s[:, 2])
    vol_o = np.abs(box_o[:, 0] * box_o[:, 1] * box_o[:, 2])
    return inter / np.maximum(np.minimum(vol_s, vol_o), 1e-9)


def _corners(boxes: np.ndarray) -> np.ndarray:
    """[K, 6] → [K, 8, 3] corner coordinates (metrics_3dfront.py:314-334)."""
    l, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    px, py, pz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float64)
    sy = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float64)
    sz = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float64)
    x = px[:, None] + sx[None] * (w[:, None] / 2)
    y = py[:, None] + sy[None] * h[:, None]
    z = pz[:, None] + sz[None] * (l[:, None] / 2)
    return np.stack([x, y, z], axis=-1)


def min_corner_distance(box_s: np.ndarray, box_o: np.ndarray) -> np.ndarray:
    cs, co = _corners(box_s), _corners(box_o)
    d = cs[:, :, None, :] - co[:, None, :, :]
    return np.sqrt(np.maximum((d ** 2).sum(-1), 0.0)).min(axis=(1, 2))


def check_rules(pred_names: Sequence[str], box_s: np.ndarray,
                box_o: np.ndarray, strict: bool = True,
                overlap_threshold: float = 0.3) -> np.ndarray:
    """Per-triple pass/fail (-1 = predicate not evaluatable)."""
    K = len(pred_names)
    out = np.full(K, -1, np.int8)
    names = np.asarray([PRED_TO_RULE.get(p, "") for p in pred_names])

    iou = aabb_overlap_over_min(box_s, box_o) if strict else np.zeros(K)
    not_overlapping = iou <= overlap_threshold

    dz = box_s[:, 5] - box_o[:, 5]
    dx = box_s[:, 3] - box_o[:, 3]
    vol_s = box_s[:, 0] * box_s[:, 1] * box_s[:, 2]
    vol_o = box_o[:, 0] * box_o[:, 1] * box_o[:, 2]
    h_s = box_s[:, 4] + box_s[:, 1]
    h_o = box_o[:, 4] + box_o[:, 1]

    def setrule(rule, ok):
        m = names == rule
        out[m] = ok[m].astype(np.int8)

    setrule("left", (dz <= -0.05) & not_overlapping)
    setrule("right", (dz >= 0.05) & not_overlapping)
    # the reference's front/behind bands are LENIENT and overlap: front
    # passes for dx >= -0.05 and behind for dx <= +0.05 (both pass inside
    # |dx| < 0.05), unlike the one-sided left/right bands
    # (metrics_3dfront.py:89-102, same in the changes variant :217-233).
    # This asymmetry is the published SCA protocol — do not "repair" it,
    # or the rates stop being comparable to the paper's tables.
    setrule("front", (dx >= -0.05) & not_overlapping)
    setrule("behind", (dx <= 0.05) & not_overlapping)
    with np.errstate(divide="ignore", invalid="ignore"):
        setrule("bigger", (vol_s - vol_o) / vol_s >= 0.15)
        setrule("smaller", (vol_s - vol_o) / vol_s <= -0.15)
        setrule("taller", (h_s - h_o) / h_s >= 0.1)
        setrule("shorter", (h_s - h_o) / h_s <= -0.1)
    setrule("standing on", np.abs(box_s[:, 4] - box_o[:, 4]) < 0.04)

    close_mask = names == "close by"
    if close_mask.any():
        d = min_corner_distance(box_s[close_mask], box_o[close_mask])
        out[close_mask] = (d <= 0.45).astype(np.int8)

    sym_mask = names == "symmetrical to"
    if sym_mask.any():
        bs, bo = box_s[sym_mask], box_o[sym_mask]
        ocx, ocz = bo[:, 3], bo[:, 5]

        def l2(fx, fz):
            return np.sqrt((fx - ocx) ** 2 + (fz - ocz) ** 2)

        ok = (l2(-bs[:, 3], -bs[:, 5]) < 0.45) | \
             (l2(-bs[:, 3], bs[:, 5]) < 0.45) | \
             (l2(bs[:, 3], -bs[:, 5]) < 0.45)
        out[sym_mask] = ok.astype(np.int8)
    return out


def validate_constraints(triples: np.ndarray, boxes_denorm: np.ndarray,
                         pred_idx_to_name: Sequence[str],
                         keep: Optional[np.ndarray] = None,
                         triple_mask: Optional[np.ndarray] = None,
                         changes_mode: bool = False, strict: bool = True,
                         accuracy: Optional[Dict[str, list]] = None
                         ) -> Dict[str, list]:
    """Accumulate per-rule pass lists (reference accuracy dict protocol).

    ``changes_mode=False``: evaluate triples whose BOTH endpoints are kept
    (validate_constrains:64-73). ``changes_mode=True``: evaluate triples with
    ANY changed endpoint (validate_constrains_changes:188-196).
    """
    if accuracy is None:
        accuracy = {k: [] for k in RULE_NAMES + ["total"]}
    triples = np.asarray(triples).reshape(-1, 3)
    if triple_mask is not None:
        triples = triples[np.asarray(triple_mask).reshape(-1) > 0]
    if keep is not None:
        ks = keep[triples[:, 0]] > 0
        ko = keep[triples[:, 2]] > 0
        sel = (ks & ko) if not changes_mode else ~(ks & ko)
        triples = triples[sel]
    if len(triples) == 0:
        return accuracy

    names = [pred_idx_to_name[p] for p in triples[:, 1]]
    box_s = boxes_denorm[triples[:, 0]]
    box_o = boxes_denorm[triples[:, 2]]
    res = check_rules(names, box_s, box_o, strict=strict)
    for r, name in zip(res, names):
        if r < 0:
            continue
        rule = PRED_TO_RULE[name]
        accuracy[rule].append(int(r))
        accuracy["total"].append(int(r))
    return accuracy


def accuracy_summary(accuracy: Dict[str, list]) -> Dict[str, float]:
    return {k: (float(np.mean(v)) if len(v) else float("nan"))
            for k, v in accuracy.items()}
