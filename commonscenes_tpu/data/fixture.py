"""Multi-scene SG-FRONT-format fixture tree writer.

Produces an on-disk dataset root with the EXACT formats the reference
reader consumes (dataset/threedfront_dataset.py:50-184 + SG-FRONT.md):
relationships/obj_boxes JSONs per (room, split), boxes_centered_stats txt,
classes_{room}.txt + mapping.json + relationships.txt, 3D-FUTURE-SDF
``ori_sample_grid.h5`` grids, and per-scan ``CLIP_small_*.pkl`` caches —
but with GENERATED content: procedurally placed bedrooms whose relation
annotations are DERIVED from the actual geometry with the same rule bands
the SCA metric checks (eval/constraints.py), and analytic truncated SDFs
(boxes/spheres/cylinders) per 3D-FUTURE model id so marching tetrahedra
yields real meshes.

This is what makes an end-to-end eval report (SCA / diversity / MMD / FID /
consistency) runnable in an environment without the real SG-FRONT download:
GT SCA on the tree is ~100% by construction, model ids repeat across scenes
(consistency pairs exist), and every metric CLI finds its inputs.

Usage:
    python -m commonscenes_tpu.data.fixture --out /tmp/sgfront_fix \
        --train 12 --test 6 --seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import zlib
from typing import Dict, List, Tuple

import numpy as np

from commonscenes_tpu.data.vocab import RELATIONSHIPS

# grained label -> coarse class (mapping.json); grained names go in
# classes_bedroom.txt, coarse names are what the vocab/model sees
GRAINED_TO_COARSE = {
    "_scene_": "_scene_",
    "double_bed": "bed",
    "single_bed": "bed",
    "nightstand": "nightstand",
    "pendant_lamp": "lamp",
    "ceiling_lamp": "lamp",
    "wardrobe": "wardrobe",
    "chair": "chair",
    "floor": "floor",
}

# per-coarse-class 3D-FUTURE model-id pools: repeats across scenes give the
# consistency metric same-model pairs to score
MODEL_POOLS = {
    "bed": [f"fix-bed-{i:03d}" for i in range(3)],
    "nightstand": [f"fix-stand-{i:03d}" for i in range(3)],
    "lamp": [f"fix-lamp-{i:03d}" for i in range(2)],
    "wardrobe": [f"fix-ward-{i:03d}" for i in range(2)],
    "chair": [f"fix-chair-{i:03d}" for i in range(2)],
}


def _sdf_grid(kind: str, rng: np.random.RandomState, res: int,
              trunc: float = 0.2) -> np.ndarray:
    """Analytic truncated SDF on a res³ grid over [-1, 1]³ (y-up shape in
    the unit cube, matching the reference's per-object normalized grids,
    threedfront_dataset.py:383-392)."""
    ax = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")

    def box_sdf(hx, hy, hz):
        qx = np.abs(x) - hx
        qy = np.abs(y) - hy
        qz = np.abs(z) - hz
        outside = np.sqrt(np.maximum(qx, 0) ** 2 + np.maximum(qy, 0) ** 2
                          + np.maximum(qz, 0) ** 2)
        inside = np.minimum(np.maximum(qx, np.maximum(qy, qz)), 0.0)
        return outside + inside

    j = 0.05 * rng.rand(3)  # per-model jitter so pool entries differ
    if kind == "bed":
        d = box_sdf(0.8 - j[0], 0.35 - j[1], 0.7 - j[2])
    elif kind == "nightstand":
        d = box_sdf(0.5 - j[0], 0.5 - j[1], 0.5 - j[2])
    elif kind == "lamp":  # sphere on a thin stem
        d = np.sqrt(x ** 2 + (y - 0.2) ** 2 + z ** 2) - (0.55 - j[0])
        stem = np.sqrt(x ** 2 + z ** 2) - 0.08
        d = np.minimum(d, np.maximum(stem, y - 0.95))
    elif kind == "wardrobe":
        d = box_sdf(0.7 - j[0], 0.9 - j[1], 0.45 - j[2])
    else:  # chair: seat box + backrest slab
        seat = box_sdf(0.55 - j[0], 0.3, 0.55 - j[2])
        back = np.sqrt(np.maximum(np.abs(x) - 0.55, 0) ** 2
                       + np.maximum(np.abs(y - 0.5) - 0.45, 0) ** 2
                       + np.maximum(np.abs(z + 0.5) - 0.1, 0) ** 2)
        d = np.minimum(seat, back)
    return np.clip(d, -trunc, trunc).astype(np.float32)


def _derive_relations(labels: List[str], boxes: np.ndarray,
                      rng: np.random.RandomState) -> List[list]:
    """[subject_inst, object_inst, 1-based pred id, text] rows derived from
    geometry with the SAME bands eval/constraints.py::check_rules scores, so
    GT SCA on the tree is ~100% by construction. Instances are 1-based."""
    pred_id = {r: i + 1 for i, r in enumerate(RELATIONSHIPS)}
    rows = []
    n = len(labels)

    def add(s, o, rel):
        rows.append([s + 1, o + 1, pred_id[rel], rel])

    for s in range(n):
        for o in range(n):
            if s == o:
                continue
            ls, lo = labels[s], labels[o]
            bs, bo = boxes[s], boxes[o]
            if lo == "floor" and ls != "floor":
                if abs(bs[4] - bo[4]) < 0.02:
                    add(s, o, "standing on")
                elif bs[4] > bo[4] + 0.5:
                    add(s, o, "above")
                continue
            if ls == "floor":
                continue
            if o < s:
                continue  # one directed row per unordered pair below
            dz = bs[5] - bo[5]
            dx = bs[3] - bo[3]
            vol_s = bs[0] * bs[1] * bs[2]
            vol_o = bo[0] * bo[1] * bo[2]
            h_s, h_o = bs[4] + bs[1], bo[4] + bo[1]
            # strict SCA additionally requires the pair NOT to overlap in
            # 3D (eval/constraints.py check_rules: overlap-over-min <= 0.3)
            # — gate directional emission on the same predicate, or
            # "GT SCA ~100%" becomes seed-dependent when random placement
            # intersects two furniture boxes (ADVICE r4)
            from commonscenes_tpu.eval.constraints import aabb_overlap_over_min
            disjoint = float(aabb_overlap_over_min(
                bs[None, :6], bo[None, :6])[0]) <= 0.3
            choices = []
            if dz <= -0.15 and disjoint:
                choices.append("left")
            elif dz >= 0.15 and disjoint:
                choices.append("right")
            if dx >= 0.15 and disjoint:
                choices.append("front")
            elif dx <= -0.15 and disjoint:
                choices.append("behind")
            if vol_o > 0 and (vol_s - vol_o) / max(vol_s, 1e-6) >= 0.2:
                choices.append("bigger than")
            elif vol_s > 0 and (vol_s - vol_o) / max(vol_s, 1e-6) <= -0.2:
                choices.append("smaller than")
            if (h_s - h_o) / max(h_s, 1e-6) >= 0.15:
                choices.append("taller than")
            elif (h_s - h_o) / max(h_s, 1e-6) <= -0.15:
                choices.append("shorter than")
            from commonscenes_tpu.eval.constraints import min_corner_distance
            if float(min_corner_distance(bs[None, :6], bo[None, :6])[0]) <= 0.4:
                choices.append("close by")
            for rel in choices[: 2 + rng.randint(2)]:
                add(s, o, rel)
    return rows


def _make_scene(rng: np.random.RandomState
                ) -> Tuple[List[str], np.ndarray, List[str]]:
    """-> (grained labels, param7 world boxes [N,7], model ids or '' )."""
    labels, boxes, models = [], [], []

    def place(label, size, pos, angle=0.0, model=""):
        labels.append(label)
        boxes.append(list(size) + list(pos) + [angle])
        models.append(model)

    cx = float(rng.uniform(-0.6, 0.6))
    cz = float(rng.uniform(-0.6, 0.6))
    bed_kind = "double_bed" if rng.rand() < 0.7 else "single_bed"
    bed_l = float(rng.uniform(1.8, 2.2))
    bed_w = float(rng.uniform(1.3, 1.9))
    bed_h = float(rng.uniform(0.8, 1.1))
    place(bed_kind, (bed_l, bed_h, bed_w), (cx, 0.0, cz),
          float(rng.uniform(-0.15, 0.15)),
          model=MODEL_POOLS["bed"][rng.randint(len(MODEL_POOLS["bed"]))])

    for side in ([-1, 1] if rng.rand() < 0.6 else [rng.choice([-1, 1])]):
        s = float(rng.uniform(0.4, 0.6))
        place("nightstand", (s, s, s),
              (cx + float(rng.uniform(-0.2, 0.2)), 0.0,
               cz + side * (bed_l / 2 + 0.5 + float(rng.uniform(0, 0.2)))),
              model=MODEL_POOLS["nightstand"][
                  rng.randint(len(MODEL_POOLS["nightstand"]))])

    lamp_kind = "pendant_lamp" if rng.rand() < 0.7 else "ceiling_lamp"
    ls = float(rng.uniform(0.3, 0.5))
    place(lamp_kind, (ls, ls, ls),
          (cx + float(rng.uniform(-0.3, 0.3)), float(rng.uniform(2.0, 2.5)),
           cz + float(rng.uniform(-0.3, 0.3))),
          model=MODEL_POOLS["lamp"][rng.randint(len(MODEL_POOLS["lamp"]))])

    if rng.rand() < 0.6:
        place("wardrobe",
              (float(rng.uniform(0.5, 0.7)), float(rng.uniform(1.8, 2.2)),
               float(rng.uniform(1.2, 1.8))),
              (cx + float(rng.choice([-1, 1])) * float(rng.uniform(1.8, 2.4)),
               0.0, cz + float(rng.uniform(-1.0, 1.0))),
              model=MODEL_POOLS["wardrobe"][
                  rng.randint(len(MODEL_POOLS["wardrobe"]))])
    if rng.rand() < 0.4:
        cs = float(rng.uniform(0.45, 0.6))
        place("chair", (cs, float(rng.uniform(0.7, 0.95)), cs),
              (cx + float(rng.uniform(-1.5, 1.5)), 0.0,
               cz + float(rng.choice([-1, 1])) * float(rng.uniform(1.6, 2.2))),
              model=MODEL_POOLS["chair"][
                  rng.randint(len(MODEL_POOLS["chair"]))])

    place("floor", (6.0, 0.05, 6.0), (0.0, 0.0, 0.0))
    return labels, np.asarray(boxes, np.float64), models


def write_fixture_tree(root: str, n_train: int = 12, n_test: int = 6,
                       room_type: str = "bedroom", seed: int = 0,
                       sdf_res: int = 64, clip_dim: int = 512) -> dict:
    """Write the full tree; returns a manifest dict (scan ids per split)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)

    grained_classes = ["_scene_", "double_bed", "single_bed", "nightstand",
                       "pendant_lamp", "ceiling_lamp", "wardrobe", "chair",
                       "floor"]
    with open(os.path.join(root, f"classes_{room_type}.txt"), "w") as f:
        f.write("\n".join(grained_classes) + "\n")
    with open(os.path.join(root, "relationships.txt"), "w") as f:
        f.write("\n".join(RELATIONSHIPS) + "\n")
    with open(os.path.join(root, "mapping.json"), "w") as f:
        json.dump(GRAINED_TO_COARSE, f, indent=1)

    used_models: Dict[str, str] = {}   # model id -> coarse kind
    manifest = {"root": root, "splits": {}}

    for split, n_scenes, prefix in (("trainval", n_train, "MasterBedroom"),
                                    ("test", n_test, "SecondBedroom")):
        scans, rel_scans, box_data = [], [], {}
        centered_rows = []
        for i in range(n_scenes):
            sid = f"{prefix}-{seed * 10000 + i}"
            scans.append(sid)
            labels, boxes, models = _make_scene(rng)
            rels = _derive_relations(labels, boxes, rng)
            # floor-level center: x/z mean over furniture (floor excluded),
            # y stays 0 — shifting py would corrupt the height-ratio rules
            scene_center = boxes[:-1, 3:6].mean(axis=0)
            scene_center[1] = 0.0
            entry = {"scene_center": [round(float(v), 6)
                                      for v in scene_center]}
            objects = {}
            for k, (label, b7, mid) in enumerate(zip(labels, boxes, models)):
                inst = str(k + 1)
                objects[inst] = label
                row = {"param7": [round(float(v), 6) for v in b7],
                       "scale": [1, 1, 1]}
                if mid:
                    row["model_path"] = os.path.join(
                        root, "3D-FUTURE-model", mid, "raw_model.obj")
                    used_models[mid] = GRAINED_TO_COARSE[label]
                else:
                    row["model_path"] = None
                entry[inst] = row
                c7 = b7.copy()
                c7[3:6] -= scene_center
                centered_rows.append(c7)
            box_data[sid] = entry
            rel_scans.append({"scan": sid, "objects": objects,
                              "relationships": rels})

            # CLIP cache pickle, format-exact (threedfront_dataset.py:477-507)
            viz = os.path.join(root, "visualization", sid)
            os.makedirs(viz, exist_ok=True)
            inst_order = list(range(1, len(labels) + 1))

            def feat(text: str) -> np.ndarray:
                # zlib.crc32: stable across processes (str hash is salted)
                r = np.random.RandomState(zlib.crc32(text.encode()))
                v = r.randn(clip_dim).astype(np.float32)
                return v / np.linalg.norm(v)

            inst_feats = np.stack([feat(labels[k - 1]) for k in inst_order]
                                  + [feat("room")])
            words = {}
            coarse = [GRAINED_TO_COARSE[lb] for lb in labels]
            for s, o, _, text in rels:
                words[f"{coarse[s - 1]} {text} {coarse[o - 1]}"] = None
            for c in coarse:
                words[f"{c} in room"] = None
            rel_feats = {w: feat(w) for w in words}
            with open(os.path.join(viz, f"CLIP_small_{sid}.pkl"), "wb") as f:
                pickle.dump({"instance_feats": inst_feats,
                             "instance_order": inst_order,
                             "rel_feats": rel_feats}, f)

        with open(os.path.join(
                root, f"relationships_{room_type}_{split}.json"), "w") as f:
            json.dump({"scans": rel_scans}, f)
        with open(os.path.join(
                root, f"obj_boxes_{room_type}_{split}.json"), "w") as f:
            json.dump(box_data, f)
        rows = np.asarray(centered_rows)
        np.savetxt(os.path.join(
            root, f"boxes_centered_stats_{room_type}_{split}.txt"),
            np.stack([rows.mean(axis=0),
                      np.maximum(rows.std(axis=0), 1e-3)]))
        manifest["splits"][split] = scans

    import h5py
    for mid, kind in sorted(used_models.items()):
        d = os.path.join(root, "3D-FUTURE-SDF", mid)
        os.makedirs(d, exist_ok=True)
        g = _sdf_grid(kind, np.random.RandomState(zlib.crc32(mid.encode())),
                      sdf_res)
        with h5py.File(os.path.join(d, "ori_sample_grid.h5"), "w") as f:
            f.create_dataset("pc_sdf_sample",
                             data=g.reshape(-1, 1).astype(np.float32))
    manifest["models"] = sorted(used_models)
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=12)
    p.add_argument("--test", type=int, default=6)
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sdf_res", type=int, default=64)
    args = p.parse_args(argv)
    man = write_fixture_tree(args.out, args.train, args.test,
                             args.room_type, args.seed, args.sdf_res)
    print(json.dumps({"root": man["root"],
                      "train": len(man["splits"]["trainval"]),
                      "test": len(man["splits"]["test"]),
                      "models": len(man["models"])}))
    return man


if __name__ == "__main__":
    main()
