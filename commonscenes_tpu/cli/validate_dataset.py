"""Turnkey SG-FRONT tree validator.

Checks an on-disk SG-FRONT dataset root against the contract the reference
reader assumes (dataset/threedfront_dataset.py:50-184 and SG-FRONT.md), so
that the day real data appears, train/eval run first-try:

* required files per (room, split): relationships/obj_boxes JSONs, the
  boxes_centered_stats txt, classes_{room}.txt, relationships.txt (and
  mapping.json when validating the coarse-class path);
* JSON structure: scans/objects/relationships rows, per-instance param7
  (7 floats) + model_path, scene_center per scene;
* cross-consistency: every relationship endpoint is a declared instance,
  predicate ids are 1-based into relationships.txt, every rel-JSON scan has
  a box-JSON entry, labels resolve into classes_{room}.txt via mapping;
* stats file: 2x7, finite, strictly positive stds;
* SDF grids: 3D-FUTURE-SDF/<model>/ori_sample_grid.h5 coverage %, sampled
  geometry check (pc_sdf_sample size == res^3, threedfront_dataset.py:383-392);
* CLIP pickles: visualization/<scan>/CLIP[_small]_<scan>.pkl coverage %,
  sampled schema check (instance_feats rows == len(instance_order)+1, 512-d,
  rel_feats dict keyed by relation phrase, threedfront_dataset.py:277-287);
* split CSVs (when present): row counts vs the published SG-FRONT splits
  (bedroom 6534 / livingroom 2926 / diningroom 2587 / library 622 rows,
  reference config/*_threed_front_splits.csv) and room-prefix sanity.

Exit code 0 when no errors (warnings allowed; --strict promotes warnings).
Prints one [ok]/[warn]/[error] line per check and a final JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from typing import List, Optional

import numpy as np

# published row counts of the reference split CSVs (wc -l, header-less)
PUBLISHED_SPLIT_ROWS = {
    "bedroom": 6534,
    "livingroom": 2926,
    "diningroom": 2587,
    "library": 622,
}

ROOMS = ("bedroom", "livingroom", "diningroom", "library")
SPLITS = ("trainval", "test")


class Report:
    def __init__(self, strict: bool = False, verbose: bool = True):
        self.strict = strict
        self.verbose = verbose
        self.errors: List[str] = []
        self.warnings: List[str] = []
        self.oks = 0

    def ok(self, msg: str):
        self.oks += 1
        if self.verbose:
            print(f"[ok]    {msg}")

    def warn(self, msg: str):
        self.warnings.append(msg)
        print(f"[warn]  {msg}")

    def error(self, msg: str):
        self.errors.append(msg)
        print(f"[error] {msg}")

    @property
    def failed(self) -> bool:
        return bool(self.errors) or (self.strict and bool(self.warnings))


def _load_json(path: str, rep: Report):
    try:
        with open(path) as f:
            return json.load(f)
    except json.JSONDecodeError as e:
        rep.error(f"{path}: invalid JSON ({e})")
        return None


def _check_stats(path: str, rep: Report):
    try:
        stats = np.loadtxt(path)
    except Exception as e:
        rep.error(f"{path}: unreadable ({e}); expected 2x7 np.savetxt "
                  f"mean/std rows")
        return
    if stats.shape != (2, 7):
        rep.error(f"{path}: shape {stats.shape}, expected (2, 7) "
                  f"(mean row + std row over param7)")
        return
    if not np.all(np.isfinite(stats)):
        rep.error(f"{path}: non-finite values")
        return
    if np.any(stats[1] <= 0):
        rep.error(f"{path}: non-positive std entries {stats[1].tolist()} — "
                  f"normalization would divide by zero")
        return
    rep.ok(f"{os.path.basename(path)}: 2x7 stats, stds positive")


def _sdf_path_for(model_path: str) -> str:
    sdf_dir = model_path.replace("3D-FUTURE-model", "3D-FUTURE-SDF")
    return os.path.join(os.path.dirname(sdf_dir), "ori_sample_grid.h5")


def validate_room_split(root: str, room: str, split: str, rep: Report,
                        sdf_res: int = 64, sample: int = 3,
                        check_clip: bool = True, large: bool = False):
    """Validate one (room, split) pair; returns scan count or None."""
    rel_file = os.path.join(root, f"relationships_{room}_{split}.json")
    box_file = os.path.join(root, f"obj_boxes_{room}_{split}.json")
    stats_file = os.path.join(root, f"boxes_centered_stats_{room}_{split}.txt")

    missing = [p for p in (rel_file, box_file) if not os.path.exists(p)]
    if missing:
        for p in missing:
            rep.error(f"missing required file: {p}")
        return None

    if os.path.exists(stats_file):
        _check_stats(stats_file, rep)
    else:
        rep.warn(f"missing {stats_file} — the reader will fall back to the "
                 f"published bedroom constants; denormalized boxes will be "
                 f"wrong for other rooms")

    rel_data = _load_json(rel_file, rep)
    box_data = _load_json(box_file, rep)
    if rel_data is None or box_data is None:
        return None
    if "scans" not in rel_data or not isinstance(rel_data["scans"], list):
        rep.error(f"{rel_file}: top-level 'scans' list missing")
        return None

    # class vocabulary (shared across splits; validated once per room by
    # the caller, but needed here to resolve labels)
    classes_path = os.path.join(root, f"classes_{room}.txt")
    known_fine = None
    mapping = None
    if os.path.exists(classes_path):
        with open(classes_path) as f:
            known_fine = set(ln.strip() for ln in f if ln.strip())
    map_path = os.path.join(root, "mapping.json")
    if not large and os.path.exists(map_path):
        mapping = _load_json(map_path, rep)

    rels_txt = os.path.join(root, "relationships.txt")
    num_preds = None
    if os.path.exists(rels_txt):
        with open(rels_txt) as f:
            num_preds = sum(1 for ln in f if ln.strip())

    n_objects = 0
    n_rels = 0
    unknown_labels = set()
    unmapped_labels = set()
    model_paths = []
    scan_ids = []
    scan_objects = {}
    bad_scans = 0
    for scan in rel_data["scans"]:
        sid = scan.get("scan")
        if not sid:
            rep.error(f"{rel_file}: scan entry without 'scan' id: "
                      f"{str(scan)[:80]}")
            bad_scans += 1
            continue
        scan_ids.append(sid)
        objects = scan.get("objects")
        if not isinstance(objects, dict):
            rep.error(f"{rel_file}: scan {sid}: 'objects' must be a dict of "
                      f"instance-id -> label")
            bad_scans += 1
            continue
        try:
            inst_ids = set(int(k) for k in objects)
        except ValueError:
            rep.error(f"{rel_file}: scan {sid}: non-integer instance id in "
                      f"'objects' keys {list(objects)[:5]}")
            bad_scans += 1
            continue
        scan_objects[sid] = inst_ids
        n_objects += len(inst_ids)
        for label in objects.values():
            if known_fine is not None and label not in known_fine:
                unknown_labels.add(label)
            if (mapping is not None and label not in mapping
                    and label != "_scene_"):
                unmapped_labels.add(label)

        for r in scan.get("relationships", []):
            n_rels += 1
            if not (isinstance(r, list) and len(r) >= 4):
                rep.error(f"{rel_file}: scan {sid}: relationship row must be "
                          f"[subject, object, pred_id, text], got {r}")
                continue
            s, o, p = r[0], r[1], r[2]
            if s not in inst_ids or o not in inst_ids:
                rep.error(f"{rel_file}: scan {sid}: relationship {r[:3]} "
                          f"references undeclared instance "
                          f"({'subject ' + str(s) if s not in inst_ids else 'object ' + str(o)})")
            if num_preds is not None and not (1 <= int(p) <= num_preds):
                rep.error(f"{rel_file}: scan {sid}: predicate id {p} out of "
                          f"range [1, {num_preds}] (1-based into "
                          f"relationships.txt; 0 is reserved for the "
                          f"synthetic 'in' root edges)")

        # box side
        boxes = box_data.get(sid)
        if boxes is None:
            rep.error(f"{box_file}: scan {sid} present in relationships "
                      f"JSON but missing here — the reader drops it")
            continue
        if "scene_center" not in boxes or len(boxes["scene_center"]) != 3:
            rep.error(f"{box_file}: scan {sid}: 'scene_center' missing or "
                      f"not a 3-vector")
        for inst in inst_ids:
            entry = boxes.get(str(inst))
            if entry is None:
                rep.warn(f"{box_file}: scan {sid}: instance {inst} "
                         f"('{objects.get(str(inst))}') has no box entry — "
                         f"the reader silently skips it")
                continue
            p7 = entry.get("param7")
            if p7 is None or len(p7) != 7:
                rep.error(f"{box_file}: scan {sid}: instance {inst}: "
                          f"'param7' missing or not length-7 (got "
                          f"{None if p7 is None else len(p7)})")
                continue
            if not all(np.isfinite(v) for v in p7):
                rep.error(f"{box_file}: scan {sid}: instance {inst}: "
                          f"non-finite param7 {p7}")
            if any(v <= 0 for v in p7[:3]):
                rep.warn(f"{box_file}: scan {sid}: instance {inst}: "
                         f"non-positive size in param7[:3] {p7[:3]}")
            if "model_path" not in entry:
                rep.warn(f"{box_file}: scan {sid}: instance {inst}: no "
                         f"'model_path' key (null is fine for floors)")
            elif entry["model_path"]:
                model_paths.append(entry["model_path"])

    extra_box_scans = set(box_data) - set(scan_ids)
    if extra_box_scans:
        rep.warn(f"{box_file}: {len(extra_box_scans)} scans present only in "
                 f"the box JSON (unused): {sorted(extra_box_scans)[:3]}...")

    if unknown_labels:
        rep.error(f"{rel_file}: labels absent from classes_{room}.txt: "
                  f"{sorted(unknown_labels)[:8]} — the reader drops these "
                  f"objects")
    if unmapped_labels:
        rep.warn(f"mapping.json: labels without a coarse mapping (used "
                 f"as-is): {sorted(unmapped_labels)[:8]}")

    # SDF coverage + sampled geometry
    sdf_found = [m for m in model_paths if os.path.exists(_sdf_path_for(m))]
    if model_paths:
        cov = 100.0 * len(sdf_found) / len(model_paths)
        msg = (f"{room}/{split}: SDF coverage {cov:.1f}% "
               f"({len(sdf_found)}/{len(model_paths)} model_paths)")
        if cov == 0.0:
            rep.warn(msg + " — shape branch will train on zero grids")
        elif cov < 100.0:
            rep.warn(msg)
        else:
            rep.ok(msg)
        try:
            import h5py
            for m in sdf_found[:sample]:
                sp = _sdf_path_for(m)
                with h5py.File(sp, "r") as f:
                    if "pc_sdf_sample" not in f:
                        rep.error(f"{sp}: missing 'pc_sdf_sample' dataset")
                        continue
                    n = int(np.prod(f["pc_sdf_sample"].shape))
                    if n != sdf_res ** 3:
                        rep.error(f"{sp}: {n} samples, expected "
                                  f"{sdf_res}^3={sdf_res ** 3} — wrong "
                                  f"resolution or truncated grid")
                    else:
                        rep.ok(f"{sp}: {sdf_res}^3 grid")
        except ImportError:
            rep.warn("h5py unavailable — skipped SDF geometry checks")

    # CLIP pickle coverage + sampled schema
    if check_clip:
        tag = "CLIP" if large else "CLIP_small"
        have = [s for s in scan_ids if os.path.exists(
            os.path.join(root, "visualization", s, f"{tag}_{s}.pkl"))]
        if scan_ids:
            cov = 100.0 * len(have) / len(scan_ids)
            msg = (f"{room}/{split}: {tag} pickle coverage {cov:.1f}% "
                   f"({len(have)}/{len(scan_ids)} scans)")
            if cov < 100.0:
                rep.warn(msg + " — missing features are recomputed on the "
                         "fly (slow) or pseudo-filled without CLIP weights")
            else:
                rep.ok(msg)
        for sid in have[:sample]:
            pkl = os.path.join(root, "visualization", sid, f"{tag}_{sid}.pkl")
            try:
                with open(pkl, "rb") as f:
                    dic = pickle.load(f)
            except Exception as e:
                rep.error(f"{pkl}: unreadable ({e})")
                continue
            for key in ("instance_feats", "instance_order", "rel_feats"):
                if key not in dic:
                    rep.error(f"{pkl}: missing key '{key}'")
            if "instance_feats" in dic and "instance_order" in dic:
                feats = np.asarray(dic["instance_feats"])
                order = list(dic["instance_order"])
                if feats.ndim != 2 or feats.shape[1] != 512:
                    rep.error(f"{pkl}: instance_feats shape {feats.shape}, "
                              f"expected (N+1, 512) (ViT-B/32 dim)")
                elif feats.shape[0] != len(order) + 1:
                    rep.error(f"{pkl}: instance_feats has {feats.shape[0]} "
                              f"rows but instance_order lists {len(order)} "
                              f"instances — expected one row per instance "
                              f"plus the trailing room row")
                else:
                    declared = scan_objects.get(sid, set())
                    missing_inst = declared - set(int(i) for i in order)
                    if missing_inst:
                        rep.warn(f"{pkl}: instances {sorted(missing_inst)} "
                                 f"absent from instance_order — they get "
                                 f"zero CLIP features")
                    else:
                        rep.ok(f"{pkl}: schema OK ({len(order)} instances)")

    rep.ok(f"{room}/{split}: {len(scan_ids) - bad_scans} scans, "
           f"{n_objects} objects, {n_rels} relationships")
    return len(scan_ids)


def validate_splits_csv(root: str, room: str, rep: Report,
                        csv_path: Optional[str] = None):
    path = csv_path or os.path.join(root, f"{room}_threed_front_splits.csv")
    if not os.path.exists(path):
        return
    import csv as _csv
    rows = 0
    bad_split_tags = set()
    with open(path) as f:
        for row in _csv.reader(f):
            if len(row) < 2:
                continue
            rows += 1
            if row[1].strip() not in ("train", "val", "test"):
                bad_split_tags.add(row[1].strip())
    expected = PUBLISHED_SPLIT_ROWS.get(room)
    if expected is not None and rows != expected:
        rep.warn(f"{path}: {rows} rows, published SG-FRONT count is "
                 f"{expected} — a different 3D-FRONT release or truncated "
                 f"file")
    elif expected is not None:
        rep.ok(f"{path}: {rows} rows match the published split count")
    if bad_split_tags:
        rep.error(f"{path}: unknown split tags {sorted(bad_split_tags)[:5]} "
                  f"(expected train/val/test)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="SG-FRONT dataset root")
    p.add_argument("--room_type", default="",
                   help="one room to validate; default: every room with a "
                        "classes_{room}.txt in the tree")
    p.add_argument("--splits", default="",
                   help="comma list; default trainval,test")
    p.add_argument("--sdf_res", type=int, default=64)
    p.add_argument("--sample", type=int, default=3,
                   help="SDF/CLIP files to deep-check per split")
    p.add_argument("--no_clip", action="store_true")
    p.add_argument("--large", action="store_true",
                   help="validate the fine-grained-class path (no "
                        "mapping.json, CLIP_ pickles instead of CLIP_small_)")
    p.add_argument("--strict", action="store_true",
                   help="warnings fail the run too")
    p.add_argument("--splits_csv", default="",
                   help="explicit {room}_threed_front_splits.csv to check")
    args = p.parse_args(argv)

    rep = Report(strict=args.strict)
    root = args.root
    if not os.path.isdir(root):
        print(f"[error] root {root} is not a directory")
        return 1

    if args.room_type:
        rooms = [args.room_type]
    else:
        rooms = [r for r in ROOMS
                 if os.path.exists(os.path.join(root, f"classes_{r}.txt"))]
        if not rooms:
            rep.error(f"no classes_{{room}}.txt found under {root} for any "
                      f"of {ROOMS} — not an SG-FRONT root?")

    if not os.path.exists(os.path.join(root, "relationships.txt")):
        rep.error(f"missing {os.path.join(root, 'relationships.txt')} — "
                  f"predicate vocabulary undefined")
    if not args.large and not os.path.exists(
            os.path.join(root, "mapping.json")):
        rep.warn(f"missing {os.path.join(root, 'mapping.json')} — "
                 f"fine-grained labels will be used as coarse classes")

    splits = [s for s in (args.splits.split(",") if args.splits else SPLITS)
              if s]
    totals = {}
    for room in rooms:
        for split in splits:
            n = validate_room_split(
                root, room, split, rep, sdf_res=args.sdf_res,
                sample=args.sample, check_clip=not args.no_clip,
                large=args.large)
            if n is not None:
                totals[f"{room}/{split}"] = n
        validate_splits_csv(root, room, rep,
                            csv_path=args.splits_csv or None)

    summary = {
        "root": root,
        "rooms": rooms,
        "scan_counts": totals,
        "checks_ok": rep.oks,
        "warnings": len(rep.warnings),
        "errors": len(rep.errors),
        "valid": not rep.failed,
    }
    print(json.dumps(summary))
    return 0 if not rep.failed else 1


if __name__ == "__main__":
    sys.exit(main())
