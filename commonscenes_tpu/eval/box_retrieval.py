"""Nearest-box mesh retrieval for the box-only model variants.

Capability parity with the reference's retrieval rendering of v1_box /
v2_box scenes (helpers/util.py:71-84 ``get_closest_furniture_to_box``,
:86-138 ``get_textured_objects_v2``, helpers/visualize_scene.py:273-298
``render_v2_box``): a database of 3D-FUTURE model ids with their box
dimensions per class; a predicted box retrieves the model whose [l,h,w]
is closest in squared L2, and the raw mesh is placed into the scene by
the predicted yaw + translation (no rescaling — the dataset meshes are
already world-scale, util.py:111-131).

The database loads from the reference's ``cat_jid_trainval[_small].json``
format (class → {model_id: [l,h,w]}) or is built from an SG-FRONT
dataset's box_data (model sizes from param7[:3]).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_obj_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: vertices + triangulated faces (fan split for
    polygons, 'v//vn'-style indices reduced to the vertex index)."""
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):   # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32).reshape(-1, 3))


def place_mesh(verts: np.ndarray, angle_deg: float,
               translation: np.ndarray) -> np.ndarray:
    """Reference placement (util.py:122-131): yaw R (row-vector convention,
    ``verts @ R``) then translate. No scaling."""
    theta = float(angle_deg) * (np.pi / 180.0)
    R = np.zeros((3, 3), np.float64)
    R[0, 0] = np.cos(theta)
    R[0, 2] = -np.sin(theta)
    R[2, 0] = np.sin(theta)
    R[2, 2] = np.cos(theta)
    R[1, 1] = 1.0
    return (verts.astype(np.float64) @ R +
            np.asarray(translation, np.float64)).astype(np.float32)


class BoxRetrieval:
    """class name → {model_id: [l,h,w]} database with cached per-class
    candidate matrices (same pattern as models/v1_full.ShapeRetrieval)."""

    def __init__(self, box_db: Dict[str, Dict[str, Sequence[float]]],
                 model_base: str = ""):
        self.db = {c: {m: np.asarray(s, np.float32)[:3]
                       for m, s in models.items()}
                   for c, models in box_db.items()}
        self.model_base = model_base
        self._mats: Dict[str, Tuple[List[str], np.ndarray]] = {}

    @classmethod
    def from_cat_jid(cls, path: str, model_base: str = "") -> "BoxRetrieval":
        """Reference cat_jid_trainval[_small].json (util.py:88-92)."""
        with open(path) as f:
            return cls(json.load(f), model_base)

    @classmethod
    def from_dataset(cls, dataset, model_base: str = "") -> "BoxRetrieval":
        """Build from an SGFrontDataset: every (class, model id) seen in the
        split contributes its param7[:3] box size."""
        db: Dict[str, Dict[str, np.ndarray]] = {}
        for sid in dataset.scans:
            for inst, label in dataset.objs[sid].items():
                entry = dataset.box_data.get(sid, {}).get(str(inst))
                if not entry or not entry.get("model_path") \
                        or "param7" not in entry:
                    continue
                coarse = (dataset.mapping.get(label, label)
                          if dataset.mapping is not None else label)
                mid = os.path.basename(
                    os.path.dirname(entry["model_path"]))
                db.setdefault(coarse, {}).setdefault(
                    mid, np.asarray(entry["param7"][:3], np.float32))
        return cls(db, model_base)

    def _candidates(self, cname: str):
        if cname not in self.db or not self.db[cname]:
            return [], np.zeros((0, 3), np.float32)
        if cname not in self._mats:
            ids = sorted(self.db[cname])
            self._mats[cname] = (
                ids, np.stack([self.db[cname][m] for m in ids]))
        return self._mats[cname]

    def lookup(self, class_name: str,
               query_size: np.ndarray) -> Optional[str]:
        """Closest model id by squared L2 over [l,h,w]
        (util.py:71-84 get_closest_furniture_to_box)."""
        ids, mat = self._candidates(class_name)
        if not ids:
            return None
        d = np.sum((mat - np.asarray(query_size, np.float32)[None, :3]) ** 2,
                   axis=-1)
        return ids[int(np.argmin(d))]

    def mesh_path(self, model_id: str) -> str:
        """3D-FUTURE-model/<id>/raw_model.obj (util.py:107)."""
        return os.path.join(self.model_base, model_id, "raw_model.obj")

    def retrieve_scene(self, class_names: Sequence[str],
                       boxes: np.ndarray, angles_deg: Sequence[float],
                       skip_classes: Sequence[str] = ("_scene_", "floor")
                       ) -> List[dict]:
        """Per-object retrieval over one scene. boxes rows are the
        denormalized [l,h,w, cx,cy,cz]; returns records with the model id
        and, when the mesh exists on disk, the placed vertices+faces."""
        out: List[dict] = []
        for j, cname in enumerate(class_names):
            if cname in skip_classes:
                continue
            mid = self.lookup(cname, boxes[j, :3])
            rec = {"slot": j, "class": cname, "model_id": mid}
            if mid is not None:
                p = self.mesh_path(mid)
                if self.model_base and os.path.exists(p):
                    vv, ff = load_obj_mesh(p)
                    rec["mesh"] = (place_mesh(vv, angles_deg[j],
                                              boxes[j, 3:6]), ff)
            out.append(rec)
        return out
