"""Legacy 3RScan / 3DSSG scene-graph reader (Graph-to-3D era).

Capability parity with reference dataset/dataset.py (RIODatasetSceneGraph,
:30-1139) for its graph surface: per-split ``relationships*.json`` scans
with 3DSSG semantics, an ``objects.json`` instance→label map, a class list
txt, and per-scan oriented bounding boxes — normalized into the framework's
RawScene layout so the same collate/train stack runs on 3RScan graphs.

Beyond the graph surface, this reader now also covers the reference's
per-instance point-cloud side (dataset/dataset.py:330-700): annotated-PLY
scene loading with per-vertex ``objectId`` labels, per-instance sampling
to a static ``npoints`` budget, the ``norm_tensor`` center/rotate/scale
normalization family (diag / whl / whl_after), semseg.v2.json
instance→label maps, canonical-direction box correction, and the legacy
accumulated box statistics (helpers/util.py:519-560), the per-instance
DeepSDF/AtlasNet latent caches (``with_feats``: per-scan
``{atlasname}_{small|large}_{splits|merged}_{section}.pkl`` dicts holding
``{'feats', 'instance_order'}``, reordered to slot order with a zero row
for the scene node — dataset/dataset.py:447-467, 585-597), and the
free-memory-gated in-RAM scan cache (helpers/psutil.py FreeMemLinux;
points are only memoized while >5 GB of host RAM is free,
dataset/dataset.py:471-479). The modern SDF grids used by the 3D-FRONT
entry points live in sgfront.py.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from commonscenes_tpu.data.collate import RawScene
from commonscenes_tpu.data.ply import read_ply_labeled
from commonscenes_tpu.data.vocab import Vocab

# accumulated 3RScan box statistics (reference helpers/util.py:527-528);
# row 0 = mean, row 1 = std over [W, L, H, Cx, Cy, Cz, angle]
RSCAN_BOX_STATS = np.array(
    [[1.3827214, 1.309359, 0.9488993, -0.12464812, 0.6188591, -0.54847,
      0.73127955],
     [1.7797655, 1.657638, 0.8501885, 1.9160025, 2.0038228, 0.70099753,
      0.50347435]], dtype=np.float64)


def normalize_box_params_legacy(p7: np.ndarray, stats: Optional[np.ndarray]
                                = None, scale: float = 3.0) -> np.ndarray:
    """Reference normalize_box_params (helpers/util.py:519-534)."""
    s = RSCAN_BOX_STATS if stats is None else stats
    p7 = np.asarray(p7, np.float64)
    return (scale * (p7 - s[0][: len(p7)]) / s[1][: len(p7)]).astype(
        np.float32)


def denormalize_box_params_legacy(p7: np.ndarray,
                                  stats: Optional[np.ndarray] = None,
                                  scale: float = 3.0) -> np.ndarray:
    """Reference denormalize_box_params (helpers/util.py:536-560)."""
    s = RSCAN_BOX_STATS if stats is None else stats
    p7 = np.asarray(p7, np.float64)
    return (p7 * s[1][: len(p7)] / scale + s[0][: len(p7)]).astype(
        np.float32)


def get_rotation_z(angle_rad: float) -> np.ndarray:
    """Z-axis rotation matrix (reference helpers/util.py:497-508)."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                    dtype=np.float32)


def norm_points(p: np.ndarray, params7: Optional[np.ndarray] = None,
                scale: bool = False, center: bool = True,
                rotation: bool = False, scale_func: str = "diag"
                ) -> np.ndarray:
    """Normalize an object point set against its oriented box.

    Numpy port of the reference ``norm_tensor``
    (dataset/dataset.py:316-362): optional centering on the box center
    (or centroid), rotation into the box's canonical frame by
    ``-params7[6]``, and scaling by ``diag`` (unit box diagonal),
    ``whl`` (each axis to [-1, 1] by box extents) or ``whl_after``
    (each axis to [-1, 1] by observed extents).
    """
    p = np.asarray(p, np.float32).copy()
    if center:
        mean = (np.mean(p, 0) if params7 is None
                else np.asarray(params7[3:6], np.float32))
        p -= mean[None, :]
    if rotation and params7 is not None:
        p = (get_rotation_z(-float(params7[6])) @ p.T).T
    if scale and params7 is not None:
        if not rotation:
            p = (get_rotation_z(-float(params7[6])) @ p.T).T
        if scale_func == "diag":
            p /= np.linalg.norm(np.asarray(params7[:3], np.float32))
        elif scale_func == "whl":
            ext = np.asarray(params7[:3], np.float32).reshape(1, 3)
            p = (p - p.min(0, keepdims=True)) / ext * 2.0 - 1.0
        elif scale_func == "whl_after":
            lo = p.min(0, keepdims=True)
            ext = p.max(0, keepdims=True) - lo
            p = (p - lo) / np.maximum(ext, 1e-8) * 2.0 - 1.0
        else:
            raise ValueError(f"unknown scale_func {scale_func!r}")
        if not rotation:
            p = (get_rotation_z(float(params7[6])) @ p.T).T
    return p


def free_mem_gb() -> float:
    """Free + reclaimable host memory in GB (reference helpers/psutil.py
    FreeMemLinux.user_free: MemFree + Buffers + Cached)."""
    try:
        with open("/proc/meminfo") as f:
            info = {}
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    info[parts[0].rstrip(":")] = int(parts[1])
        kb = (info.get("MemFree", 0) + info.get("Buffers", 0)
              + info.get("Cached", 0))
        return kb / 1024 / 1024
    except OSError:
        return 0.0


def load_feats_pkl(path: str, instances_order: List[int],
                   feat_dim: Optional[int] = None) -> Optional[np.ndarray]:
    """Per-scan shape-latent cache → slot-ordered [n+1, D] array.

    The reference pickles ``{'feats': [k+1, D], 'instance_order': [k]}``
    per scan (the trailing feats row belongs to the scene node) and
    reorders rows to the scene's instance order at load time, appending a
    fresh zero row for the scene node (dataset/dataset.py:585-597).
    Instances missing from the cache get zero rows (the reference would
    produce an empty selection there)."""
    import pickle

    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        dic = pickle.load(f)
    feats = np.asarray(dic["feats"], np.float32)
    order = np.asarray(dic["instance_order"]).reshape(-1)
    D = feat_dim or feats.shape[1]
    rows = []
    for inst in instances_order:
        sel = feats[:-1][order == inst]
        rows.append(sel if len(sel) else np.zeros((1, D), np.float32))
    rows.append(np.zeros((1, D), np.float32))   # scene node
    return np.concatenate(rows, axis=0).astype(np.float32)


def load_semseg(json_file: str) -> Dict[int, str]:
    """segGroups instance-id → lowercase label
    (reference dataset/dataset.py:364-375)."""
    with open(json_file) as f:
        data = json.load(f)
    return {int(g["id"]): g["label"].lower() for g in data["segGroups"]}


def apply_canonical_direction(p7: np.ndarray, direction: int) -> np.ndarray:
    """Shift the box angle by the annotated facing direction and swap
    W/L for sideways boxes (reference dataset/dataset.py:520-536);
    directions -1/0/6 are ambiguous and left unchanged."""
    p7 = np.asarray(p7, np.float32).copy()
    if 1 < direction < 5:
        p7[6] += (direction - 1) * np.deg2rad(90.0)
        if direction in (2, 4):
            p7[0], p7[1] = p7[1], p7[0]
    return p7


ANGLE_BINS_24 = np.linspace(0, np.deg2rad(360.0), 24)


class RScanDataset:
    def __init__(self, root: str, split: str = "train", use_scene_rels: bool = True,
                 with_clip: bool = False, clip_dim: int = 512,
                 data_len: Optional[int] = None,
                 use_points: bool = False, npoints: int = 1024,
                 root_3rscan: Optional[str] = None,
                 label_file: str = "labels.instances.annotated.v2.ply",
                 use_canonical: bool = False, scale_func: str = "diag",
                 normalize_boxes: bool = False, seed: int = 0,
                 with_feats: bool = False, path2atlas: Optional[str] = None,
                 use_splits: bool = False, large: bool = True,
                 feat_dim: int = 128, min_free_gb: float = 5.0):
        """``use_points`` loads the annotated scan PLY
        (``root_3rscan/<scan>/<label_file>``), segments vertices by the
        per-vertex objectId, samples ``npoints`` per instance and
        normalizes each set against its oriented box — the reference
        RIODatasetSceneGraph points path (dataset/dataset.py:470-640).
        ``normalize_boxes`` applies the legacy accumulated box stats
        (reference non-vae_baseline branch, dataset/dataset.py:543-548);
        off by default to keep raw metric boxes.

        ``with_feats`` loads per-instance DeepSDF/AtlasNet latents from
        the per-scan pickle caches the reference precomputes
        (``<root_3rscan>/<scan>/{atlasname}_{small|large}_{splits|merged}
        _<section>.pkl``, dataset/dataset.py:447-467); ``path2atlas``
        supplies the encoder checkpoint path whose basename keys the
        cache filename. Loaded latents arrive slot-ordered on
        ``RawScene.shape_feats`` with a zero row for the scene node and
        feed v1_full's GT-code branch."""
        self.root = root
        self.use_scene_rels = use_scene_rels
        self.with_clip = with_clip
        self.clip_dim = clip_dim
        self.data_len = data_len
        self.use_points = use_points
        self.npoints = npoints
        self.root_3rscan = root_3rscan or root
        self.label_file = label_file
        self.use_canonical = use_canonical
        self.scale_func = scale_func
        self.normalize_boxes = normalize_boxes
        self.rng = np.random.RandomState(seed)
        self.with_feats = with_feats
        self.path2atlas = path2atlas
        self.use_splits = use_splits
        self.large = large
        self.feat_dim = feat_dim
        self.min_free_gb = min_free_gb
        self._ply_cache: Dict[str, tuple] = {}

        with open(os.path.join(root, "classes.txt")) as f:
            classes = [ln.strip() for ln in f if ln.strip()]
        rel_path = os.path.join(root, "relationships.txt")
        with open(rel_path) as f:
            rels = [ln.strip() for ln in f if ln.strip()]
        self.vocab = Vocab(obj_classes=sorted(set(classes + ["_scene_"])),
                           obj_classes_grained=sorted(set(classes + ["_scene_"])),
                           predicates=["in"] + rels)

        # the reference's published filename conventions, in priority order
        # (dataset/dataset.py:95-106: relationships_merged_{}_clean.json full
        # scenes / relationships_{}_clean.json ≤9-object sections, and
        # obj_boxes_{train,val}_refined.json)
        tag = "train" if split in ("train", "train_scans") else "validation"
        candidates = [
            f"relationships_merged_{tag}_clean.json",
            f"relationships_{tag}_clean.json",
            f"relationships_{tag}.json",
            "relationships.json",
        ]
        fname = next((os.path.join(root, c) for c in candidates
                      if os.path.exists(os.path.join(root, c))),
                     os.path.join(root, candidates[-1]))
        with open(fname) as f:
            data = json.load(f)

        scans = list(data.get("scans", []))
        # optional split list ({train,validation}.txt, dataset.py:87-91)
        split_txt = os.path.join(root, f"{tag}.txt")
        if os.path.exists(split_txt):
            with open(split_txt) as f:
                keep = {ln.strip() for ln in f if ln.strip()}
            scans = [s for s in scans if s.get("scan") in keep]
        self.scans: List[dict] = scans

        box_tag = "train" if tag == "train" else "val"
        box_candidates = [f"obj_boxes_{box_tag}_refined.json",
                          "obj_boxes.json"]
        self.boxes: Dict[str, dict] = {}
        for c in box_candidates:
            p = os.path.join(root, c)
            if os.path.exists(p):
                with open(p) as f:
                    self.boxes = json.load(f)
                break

    def __len__(self) -> int:
        return self.data_len if self.data_len is not None else len(self.scans)

    def _scan_points(self, scan_id: str):
        """Annotated scene PLY → (points [N,3], vertex objectIds [N]),
        cached per scan (reference dataset/dataset.py:473-479 file cache).
        The reference keys scans as '<id>_<split-section>'; the PLY lives
        under the bare id (dataset/dataset.py:386-399)."""
        base = scan_id.split("_")[0]
        if base in self._ply_cache:
            return self._ply_cache[base]
        path = os.path.join(self.root_3rscan, base, self.label_file)
        data = read_ply_labeled(path)
        # memoize only while host RAM is plentiful (reference gates its
        # scan cache on FreeMemLinux.user_free > 5, dataset.py:477)
        if free_mem_gb() > self.min_free_gb:
            self._ply_cache[base] = data
        return data

    def _feats_path(self, scan_id: str) -> str:
        """Reference per-scan latent-cache filename
        ('{atlasname}_{small|large}_{splits|merged}_{section}.pkl',
        dataset/dataset.py:447-467)."""
        atlasname = "deepsdf"
        if self.path2atlas:
            atlasname = os.path.splitext(os.path.basename(self.path2atlas))[0]
        parts = scan_id.split("_")
        base, section = parts[0], parts[1] if len(parts) > 1 else "0"
        return os.path.join(
            self.root_3rscan, base,
            "{}_{}_{}_{}.pkl".format(atlasname,
                                     "large" if self.large else "small",
                                     "splits" if self.use_splits else "merged",
                                     section))

    def _instance_labels(self, scan_id: str) -> Optional[Dict[int, str]]:
        """semseg.v2.json / semseg.json instance→label map when present
        (reference dataset/dataset.py:400-408)."""
        base = scan_id.split("_")[0]
        for name in ("semseg.v2.json", "semseg.json"):
            p = os.path.join(self.root_3rscan, base, name)
            if os.path.exists(p):
                return load_semseg(p)
        return None

    def __getitem__(self, index: int) -> RawScene:
        scan = self.scans[index % len(self.scans)]
        scan_id = scan.get("scan", str(index))
        objects = {int(k): v for k, v in scan.get("objects", {}).items()}
        # prefer the semseg instance→label map when the per-scan tree
        # ships one; relationships-json objects otherwise
        semseg = self._instance_labels(scan_id) if self.use_points else None
        if semseg:
            objects = {i: lb for i, lb in semseg.items() if i in objects}

        inst_to_slot, cat_ids = {}, []
        boxes, angles, raw_p7s, inst_ids = [], [], [], []
        box_data = self.boxes.get(scan_id, {})
        for inst_id, label in objects.items():
            if label not in self.vocab.class_to_idx:
                continue
            inst_to_slot[inst_id] = len(cat_ids)
            cat_ids.append(self.vocab.class_to_idx[label])
            inst_ids.append(inst_id)
            entry = box_data.get(str(inst_id), {})
            p7 = np.asarray(entry.get("param7", [1, 1, 1, 0, 0, 0, 0]),
                            np.float32)
            if self.use_canonical and "direction" in entry:
                p7 = apply_canonical_direction(p7, int(entry["direction"]))
            raw_p7s.append(p7)
            # reference digitizes raw (dataset/dataset.py:546) and its train
            # script clamps to [0,24); fold the clamp in here like
            # data/sgfront.py does, since RawScene feeds the model directly
            angles.append(int(np.clip(
                np.digitize(p7[6], ANGLE_BINS_24) - 1, 0, 23)))
            boxes.append(normalize_box_params_legacy(p7)[:6]
                         if self.normalize_boxes else p7[:6])

        triples = []
        for r in scan.get("relationships", []):
            s, o, p = int(r[0]), int(r[1]), int(r[2])
            if s in inst_to_slot and o in inst_to_slot \
                    and 1 <= p < self.vocab.num_pred_classes:
                triples.append([inst_to_slot[s], p, inst_to_slot[o]])

        obj_points = None
        if self.use_points:
            from commonscenes_tpu.data import native as dk
            pts, vert_ids = self._scan_points(scan_id)
            n_sets = len(cat_ids) + int(self.use_scene_rels)
            obj_points = np.zeros((n_sets, self.npoints, 3), np.float32)
            if vert_ids is not None and inst_ids:
                # one counting-sort pass over the scan instead of a masked
                # scan per instance (native kernel, numpy fallback)
                idx, off = dk.partition_vertices(
                    vert_ids, np.asarray(inst_ids, np.int32))
            for i, inst_id in enumerate(inst_ids):
                sel = (pts[idx[off[i]:off[i + 1]]]
                       if vert_ids is not None else pts[:0])
                if len(sel) == 0:
                    continue  # annotated-but-unsegmented instance: zeros
                if len(sel) >= self.npoints:
                    choice = self.rng.choice(len(sel), self.npoints,
                                             replace=False)
                else:
                    # fill by repetition, then shuffle
                    # (reference dataset/dataset.py:616-623)
                    extra = self.rng.choice(len(sel),
                                            self.npoints - len(sel),
                                            replace=True)
                    choice = np.concatenate([np.arange(len(sel)), extra])
                    self.rng.shuffle(choice)
                obj_points[i] = norm_points(
                    sel[choice], raw_p7s[i], scale=True,
                    rotation=self.use_canonical,
                    scale_func=self.scale_func)

        shape_feats = None
        if self.with_feats:
            shape_feats = load_feats_pkl(self._feats_path(scan_id),
                                         inst_ids, self.feat_dim)
            if shape_feats is not None and not self.use_scene_rels:
                shape_feats = shape_feats[:-1]   # no scene-node slot

        if self.use_scene_rels:
            root_slot = len(cat_ids)
            for i in range(len(cat_ids)):
                triples.append([i, 0, root_slot])
            cat_ids.append(self.vocab.scene_class_id)
            boxes.append(np.full(6, -1.0, np.float32))
            angles.append(0)
            inst_ids.append(-1)

        n = len(cat_ids)
        objs = np.asarray(cat_ids, np.int32)
        return RawScene(
            objs=objs,
            objs_grained=objs.copy(),
            triples=np.asarray(triples, np.int32).reshape(-1, 3),
            boxes=np.stack(boxes) if boxes else np.zeros((0, 6), np.float32),
            angles=np.asarray(angles, np.int32),
            text_feats=np.zeros((n, self.clip_dim), np.float32)
            if self.with_clip else None,
            rel_feats=np.zeros((len(triples), self.clip_dim), np.float32)
            if self.with_clip else None,
            scan_id=scan_id,
            instance_ids=np.asarray(inst_ids, np.int32),
            points=obj_points,
            shape_feats=shape_feats,
        )
