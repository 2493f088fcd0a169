"""SG-FRONT dataset reader (real-data path).

Capability parity with reference dataset/threedfront_dataset.py:50-580 for
the published SG-FRONT format (SG-FRONT.md):

* ``relationships_{room}_{split}.json`` — scans with objects + [s, o, pred_id,
  text] relationships (pred ids 1-based into relationships.txt; 'in'=0 is
  reserved for the synthetic scene-root edges);
* ``obj_boxes_{room}_{split}.json`` — per-instance param7 oriented boxes +
  scene_center;
* ``boxes_centered_stats_{room}_{split}.txt`` — 2×7 mean/std rows;
* ``classes_{room}.txt`` + ``mapping.json`` — fine→coarse class coarsening;
* per-object 64³ SDF grids in ``3D-FUTURE-SDF/<model>/ori_sample_grid.h5``;
* cached CLIP features ``visualization/<scan>/CLIP[_small]_<scan>.pkl``.

Output is the framework's RawScene (padded later by data.collate) — angle
binned into 24 bins over [-180°, 180°] (threedfront_dataset.py:377-378), box
params z-score normalized ×3 (helpers/util.py:519-533), '_scene_' root node
with 'in' edges appended (threedfront_dataset.py:448-459).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from commonscenes_tpu.data.collate import RawScene
from commonscenes_tpu.data.vocab import Vocab


def _load_box_stats(path: str):
    stats = np.loadtxt(path)
    return stats[0].astype(np.float32), stats[1].astype(np.float32)


class SGFrontDataset:
    """Reads one (room_type, split) of SG-FRONT into RawScene objects."""

    def __init__(self, root: str, split: str = "train", room_type: str = "bedroom",
                 large: bool = False, use_sdf: bool = False, sdf_res: int = 64,
                 trunc_thres: float = 0.2, use_scene_rels: bool = True,
                 shuffle_objs: bool = True, with_clip: bool = True,
                 clip_dim: int = 512, clip_cache=None, seed: int = 0,
                 data_len: Optional[int] = None):
        self.root = root
        self.room_type = room_type
        self.split_tag = "trainval" if split in ("train", "train_scans", "trainval") else "test"
        self.vocab = Vocab.from_sgfront(root, room_type, large=large)
        self.large = large
        self.use_sdf = use_sdf
        self.sdf_res = sdf_res
        self.trunc_thres = trunc_thres
        self.use_scene_rels = use_scene_rels
        self.shuffle_objs = shuffle_objs
        self.with_clip = with_clip
        self.clip_dim = clip_dim
        self.clip_cache = clip_cache
        self.seed = seed
        self.data_len = data_len

        rel_file = os.path.join(root, f"relationships_{room_type}_{self.split_tag}.json")
        box_file = os.path.join(root, f"obj_boxes_{room_type}_{self.split_tag}.json")
        stats_file = os.path.join(
            root, f"boxes_centered_stats_{room_type}_{self.split_tag}.txt")
        # per-split normalization stats (reference helpers/util.py:536-562
        # loads boxes_centered_stats_{room}_{split}.txt). ``box_mean/std``
        # are the 6-param stats eval must use for denormalization; the
        # 7-param versions (incl. angle) drive input normalization. Falls
        # back to the published bedroom constants when the file is absent.
        from commonscenes_tpu.data.synthetic import BOX_MEAN, BOX_STD
        self.box_mean, self.box_std = BOX_MEAN, BOX_STD
        self._stats7 = None
        if os.path.exists(stats_file):
            m, sd_ = _load_box_stats(stats_file)
            self._stats7 = (m, sd_)
            self.box_mean, self.box_std = m[:6], sd_[:6]

        with open(rel_file) as f:
            rel_data = json.load(f)
        with open(box_file) as f:
            self.box_data = json.load(f)

        mapping_path = os.path.join(root, "mapping.json")
        self.mapping = None
        if not large and os.path.exists(mapping_path):
            with open(mapping_path) as f:
                self.mapping = json.load(f)

        self.scans: List[str] = []
        self.rels: Dict[str, list] = {}
        self.objs: Dict[str, Dict[int, str]] = {}
        for scan in rel_data["scans"]:
            sid = scan["scan"]
            if sid not in self.box_data:
                continue
            self.scans.append(sid)
            self.rels[sid] = scan["relationships"]
            self.objs[sid] = {int(k): v for k, v in scan["objects"].items()}

        self.fine_idx = {c: i for i, c in
                         enumerate(sorted(set(
                             self.vocab.obj_classes_grained)))}

    def __len__(self) -> int:
        return self.data_len if self.data_len is not None else len(self.scans)

    def model_ids_by_class(self) -> Dict[str, list]:
        """coarse class name → 3D-FUTURE model ids seen in this split
        (reference box_data[class_name] candidate sets for retrieval,
        VAE.py:296-319). Model id = the directory holding raw_model.obj."""
        out: Dict[str, set] = {}
        for sid in self.scans:
            for inst, label in self.objs[sid].items():
                entry = self.box_data.get(sid, {}).get(str(inst))
                if not entry or not entry.get("model_path"):
                    continue
                coarse = (self.mapping.get(label, label)
                          if self.mapping is not None else label)
                mid = os.path.basename(os.path.dirname(entry["model_path"]))
                out.setdefault(coarse, set()).add(mid)
        return {k: sorted(v) for k, v in out.items()}

    def model_ids_for_scan(self, scan_id: str) -> Dict[int, str]:
        """instance id → 3D-FUTURE model id for one scan (the per-object
        jid the reference uses to read GT DeepSDF codes from disk,
        model/VAE.py:38-46)."""
        out: Dict[int, str] = {}
        for inst in self.objs.get(scan_id, {}):
            entry = self.box_data.get(scan_id, {}).get(str(inst))
            if entry and entry.get("model_path"):
                out[int(inst)] = os.path.basename(
                    os.path.dirname(entry["model_path"]))
        return out

    def normalize_box(self, param7: np.ndarray) -> np.ndarray:
        if self._stats7 is None:
            out = param7.copy()
            out[:6] = 3.0 * (param7[:6] - self.box_mean) / self.box_std
            return out
        m, sd_ = self._stats7
        return 3.0 * (param7 - m) / sd_

    def _read_sdf(self, model_path: Optional[str]) -> Optional[np.ndarray]:
        if not model_path:
            return None
        sdf_dir = model_path.replace("3D-FUTURE-model", "3D-FUTURE-SDF")
        sdf_path = os.path.join(os.path.dirname(sdf_dir), "ori_sample_grid.h5")
        if not os.path.exists(sdf_path):
            return None
        import h5py
        with h5py.File(sdf_path, "r") as f:
            grid = f["pc_sdf_sample"][:].astype(np.float32)
        grid = grid.reshape(self.sdf_res, self.sdf_res, self.sdf_res)
        return np.clip(grid, -self.trunc_thres, self.trunc_thres)

    def _clip_feats(self, scan_id: str, instances_order, cat_names, triples_words):
        """Load the reference's pickle cache if present; otherwise delegate
        to the clip_cache text encoder (or deterministic pseudo-features)."""
        tag = "CLIP" if self.large else "CLIP_small"
        pkl = os.path.join(self.root, "visualization", scan_id,
                           f"{tag}_{scan_id}.pkl")
        if os.path.exists(pkl):
            with open(pkl, "rb") as f:
                dic = pickle.load(f)
            feats_ins = np.asarray(dic["instance_feats"], np.float32)
            order = np.asarray(dic["instance_order"])
            out = []
            for inst in instances_order:
                row = feats_ins[:-1][order == inst]
                if row.shape[0] == 0:
                    # an instance absent from the pickle must NOT be
                    # dropped — that would shift every later object onto
                    # its neighbour's feature row; zero-fill and warn
                    import sys
                    print(f"[!] {pkl}: instance {inst} missing from "
                          f"instance_order — zero CLIP feature",
                          file=sys.stderr)
                    row = np.zeros((1, feats_ins.shape[1]), np.float32)
                out.append(row[:1])
            out.append(feats_ins[-1][None])
            text_feats = np.concatenate(out, 0)
            # the reference writes rel_feats as a dict keyed by the relation
            # phrase (threedfront_dataset.py:477-507: feats_rel[words[i]]),
            # re-assembled per triple in word order at read time
            rel_raw = dic["rel_feats"]
            if isinstance(rel_raw, dict):
                dim = feats_ins.shape[1]
                rows = [np.asarray(rel_raw[w], np.float32).reshape(-1)
                        if w in rel_raw else np.zeros(dim, np.float32)
                        for w in triples_words]
                rel_feats = (np.stack(rows) if rows
                             else np.zeros((0, dim), np.float32))
            else:
                rel_feats = np.asarray(rel_raw, np.float32)
            return text_feats, rel_feats
        if self.clip_cache is not None:
            text_feats = np.stack([self.clip_cache.text_feature(n)
                                   for n in cat_names])
            rel_feats = (np.stack([self.clip_cache.text_feature(w)
                                   for w in triples_words])
                         if triples_words else
                         np.zeros((0, self.clip_dim), np.float32))
            return text_feats, rel_feats
        return (np.zeros((len(cat_names), self.clip_dim), np.float32),
                np.zeros((len(triples_words), self.clip_dim), np.float32))

    def __getitem__(self, index: int) -> RawScene:
        index = int(index)  # numpy ints from batch samplers break random.Random
        scan_id = self.scans[index % len(self.scans)]
        instance2label = self.objs[scan_id]
        keys = list(instance2label.keys())
        if self.shuffle_objs:
            random.Random(self.seed * 1000003 + index).shuffle(keys)

        boxes_json = self.box_data[scan_id]
        scene_center = np.asarray(boxes_json["scene_center"], np.float32)

        cat_ids, cat_ids_grained, tight_boxes, cat_names = [], [], [], []
        inst_to_slot: Dict[int, int] = {}
        sdfs, has_sdf = [], []
        instances_order = []
        for key in keys:
            label = instance2label[key]
            if self.mapping is not None:
                grained_id = self.fine_idx.get(label, 0)
                coarse = self.mapping.get(label, label)
            else:
                grained_id = self.vocab.grained_to_idx.get(label, 0)
                coarse = label
            if coarse not in self.vocab.class_to_idx:
                continue
            entry = boxes_json.get(str(key))
            if entry is None or "param7" not in entry:
                continue
            inst_to_slot[key] = len(cat_ids)
            cat_ids.append(self.vocab.class_to_idx[coarse])
            cat_ids_grained.append(grained_id)
            cat_names.append(coarse)
            instances_order.append(key)

            bbox = np.asarray(entry["param7"], np.float32).copy()
            bbox[3:6] -= scene_center
            bins = np.linspace(np.deg2rad(-180), np.deg2rad(180), 24)
            angle_bin = int(np.digitize(bbox[6], bins))
            bbox = self.normalize_box(bbox)
            bbox[6] = angle_bin
            tight_boxes.append(bbox)

            if self.use_sdf:
                grid = self._read_sdf(entry.get("model_path"))
                if grid is None:
                    sdfs.append(np.zeros((self.sdf_res,) * 3, np.float32))
                    has_sdf.append(False)
                else:
                    sdfs.append(grid)
                    has_sdf.append(True)

        triples, words = [], []
        for r in self.rels[scan_id]:
            if r[0] in inst_to_slot and r[1] in inst_to_slot:
                s = inst_to_slot[r[0]]
                o = inst_to_slot[r[1]]
                p = int(r[2])  # 1-based into relationships.txt; 0='in'
                triples.append([s, p, o])
                sub_name = cat_names[s]
                obj_name = cat_names[o]
                words.append(f"{sub_name} {r[3]} {obj_name}")

        if self.use_scene_rels:
            root_slot = len(cat_ids)
            for i in range(len(cat_ids)):
                triples.append([i, 0, root_slot])
                words.append(f"{cat_names[i]} in room")
            cat_ids.append(self.vocab.scene_class_id)
            cat_ids_grained.append(0)
            cat_names.append("_scene_")
            dummy = np.full(7, -1.0, np.float32)
            dummy[6] = 0
            tight_boxes.append(dummy)
            if self.use_sdf:
                sdfs.append(np.zeros((self.sdf_res,) * 3, np.float32))
                has_sdf.append(False)

        tight = np.stack(tight_boxes)
        boxes6 = tight[:, :6]
        # angle bins clamped to [0, 24) (train_3dfront.py:154-159)
        angles = np.clip(tight[:, 6].astype(np.int32) - 1, 0, 23)

        text_feats = rel_feats = None
        if self.with_clip:
            text_feats, rel_feats = self._clip_feats(
                scan_id, instances_order, cat_names, words)

        inst_ids = np.asarray(instances_order +
                              ([-1] if self.use_scene_rels else []),
                              np.int32)
        return RawScene(
            objs=np.asarray(cat_ids, np.int32),
            objs_grained=np.asarray(cat_ids_grained, np.int32),
            triples=np.asarray(triples, np.int32).reshape(-1, 3),
            boxes=boxes6.astype(np.float32),
            angles=angles,
            text_feats=text_feats,
            rel_feats=rel_feats,
            sdfs=np.stack(sdfs) if self.use_sdf else None,
            has_sdf=np.asarray(has_sdf) if self.use_sdf else None,
            scan_id=scan_id,
            instance_ids=inst_ids,
        )
