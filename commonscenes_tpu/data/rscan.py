"""Legacy 3RScan / 3DSSG scene-graph reader (Graph-to-3D era).

Capability parity with reference dataset/dataset.py (RIODatasetSceneGraph,
:30-1139) for its graph surface: per-split ``relationships*.json`` scans
with 3DSSG semantics, an ``objects.json`` instance→label map, a class list
txt, and per-scan oriented bounding boxes — normalized into the framework's
RawScene layout so the same collate/train stack runs on 3RScan graphs.

(The reference's point-cloud/DeepSDF loading sides of this dataset are
superseded by the SDF path in sgfront.py; only the graph surface is kept,
matching how the 3D-FRONT entry points never touch this reader.)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from commonscenes_tpu.data.collate import RawScene
from commonscenes_tpu.data.vocab import Vocab


class RScanDataset:
    def __init__(self, root: str, split: str = "train", use_scene_rels: bool = True,
                 with_clip: bool = False, clip_dim: int = 512,
                 data_len: Optional[int] = None):
        self.root = root
        self.use_scene_rels = use_scene_rels
        self.with_clip = with_clip
        self.clip_dim = clip_dim
        self.data_len = data_len

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

    def __getitem__(self, index: int) -> RawScene:
        scan = self.scans[index % len(self.scans)]
        scan_id = scan.get("scan", str(index))
        objects = {int(k): v for k, v in scan.get("objects", {}).items()}

        inst_to_slot, cat_ids = {}, []
        boxes = []
        box_data = self.boxes.get(scan_id, {})
        for inst_id, label in objects.items():
            if label not in self.vocab.class_to_idx:
                continue
            inst_to_slot[inst_id] = len(cat_ids)
            cat_ids.append(self.vocab.class_to_idx[label])
            entry = box_data.get(str(inst_id), {})
            p7 = entry.get("param7", [1, 1, 1, 0, 0, 0, 0])
            boxes.append(np.asarray(p7[:6], np.float32))

        triples = []
        for r in scan.get("relationships", []):
            s, o, p = int(r[0]), int(r[1]), int(r[2])
            if s in inst_to_slot and o in inst_to_slot \
                    and 1 <= p < self.vocab.num_pred_classes:
                triples.append([inst_to_slot[s], p, inst_to_slot[o]])

        if self.use_scene_rels:
            root_slot = len(cat_ids)
            for i in range(len(cat_ids)):
                triples.append([i, 0, root_slot])
            cat_ids.append(self.vocab.scene_class_id)
            boxes.append(np.full(6, -1.0, np.float32))

        n = len(cat_ids)
        objs = np.asarray(cat_ids, np.int32)
        return RawScene(
            objs=objs,
            objs_grained=objs.copy(),
            triples=np.asarray(triples, np.int32).reshape(-1, 3),
            boxes=np.stack(boxes) if boxes else np.zeros((0, 6), np.float32),
            angles=np.zeros(n, np.int32),
            text_feats=np.zeros((n, self.clip_dim), np.float32)
            if self.with_clip else None,
            rel_feats=np.zeros((len(triples), self.clip_dim), np.float32)
            if self.with_clip else None,
            scan_id=scan_id,
        )
