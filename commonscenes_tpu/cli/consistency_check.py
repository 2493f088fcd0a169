"""Consistency metric driver.

Capability parity with reference scripts/consistency_check.py:1-107: score
appearance/shape consistency of object pairs linked by same-style /
same-material / same-supercategory edges, over eval exports
(``<export_dir>/<scan>_sdf.npz`` + layouts.json from cli/eval_3dfront.py).
Pair lists come from a consistencies_{room}_test.json file (the reference's
instance-id format, mapped to export slots via layouts.json instance_ids),
a flat {scan: [[slot, slot], ...]} dict, or — absent both — all object
pairs per scan.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

try:  # register bfloat16 with numpy before any np.load
    import ml_dtypes  # noqa: F401
except ImportError:
    pass


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export_dir", required=True)
    p.add_argument("--pairs_json", default="",
                   help="optional consistencies_{room}_test.json")
    p.add_argument("--n_points", type=int, default=2048)
    p.add_argument("--out", default="",
                   help="write the report as valid JSON to this file")
    args = p.parse_args(argv)

    from commonscenes_tpu.eval.consistency import consistency_scores

    # pair lists: either the reference consistencies_{room}_test.json format
    # ({"scans": [{"scan", "objects", "consistency": [[sub_inst, obj_inst],
    # ...]}]}, scripts/consistency_check.py:33-50) with INSTANCE ids, or a
    # flat {scan: [[slot, slot], ...]} dict
    inst_pairs_by_scan = {}
    slot_pairs_by_scan = {}
    if args.pairs_json and os.path.exists(args.pairs_json):
        with open(args.pairs_json) as f:
            d = json.load(f)
        if isinstance(d, dict) and "scans" in d:
            for scan in d["scans"]:
                inst_pairs_by_scan[scan["scan"]] = [
                    (int(t[0]), int(t[1])) for t in scan.get("consistency", [])]
        else:
            slot_pairs_by_scan = {k: [(int(a), int(b)) for a, b in v]
                                  for k, v in d.items()}

    # instance → slot mapping from the eval export (layouts.json carries
    # per-scene instance_ids when the dataset provides them)
    inst_to_slot_by_scan = {}
    layouts_path = os.path.join(args.export_dir, "layouts.json")
    if os.path.exists(layouts_path):
        with open(layouts_path) as f:
            for rec in json.load(f):
                ids = rec.get("instance_ids")
                if ids:
                    inst_to_slot_by_scan[rec["scan_id"]] = {
                        int(inst): slot for slot, inst in enumerate(ids)
                        if int(inst) >= 0}

    agg = {"consistency_pairs": 0, "consistency_feature_cos": [],
           "consistency_chamfer": []}
    files = sorted(glob.glob(os.path.join(args.export_dir, "*_sdf.npz")))
    for f in files:
        scan = os.path.basename(f)[:-len("_sdf.npz")]
        data = np.load(f)
        sdfs = np.asarray(data["sdf"])
        if sdfs.dtype.kind == "V":  # raw bfloat16 bytes from older exports
            import ml_dtypes
            sdfs = sdfs.view(ml_dtypes.bfloat16)
        sdfs = sdfs.astype(np.float32)
        # sdf rows are PACKED: data["slots"] maps row → scene slot
        slot_arr = np.asarray(data["slots"]) if "slots" in data else \
            np.arange(len(sdfs))
        row_of_slot = {int(sl): r for r, sl in enumerate(slot_arr)}

        pairs_rows = None
        if scan in inst_pairs_by_scan and scan not in inst_to_slot_by_scan:
            # the curated pair list can't be mapped without the export's
            # instance_ids — skip rather than silently scoring all pairs
            print(f"[!] {scan}: pairs_json given but the export has no "
                  f"instance_ids mapping — skipping this scan")
            continue
        if scan in inst_pairs_by_scan and scan in inst_to_slot_by_scan:
            i2s = inst_to_slot_by_scan[scan]
            pairs_rows = [
                (row_of_slot[i2s[a]], row_of_slot[i2s[b]])
                for a, b in inst_pairs_by_scan[scan]
                if a in i2s and b in i2s
                and i2s[a] in row_of_slot and i2s[b] in row_of_slot]
        elif scan in slot_pairs_by_scan:
            pairs_rows = [
                (row_of_slot[a], row_of_slot[b])
                for a, b in slot_pairs_by_scan[scan]
                if a in row_of_slot and b in row_of_slot]

        if pairs_rows is None and (inst_pairs_by_scan or slot_pairs_by_scan):
            # a curated pair list was supplied but omits this scan — the
            # reference protocol scores ONLY listed pairs, so skip instead
            # of silently mixing all-pairs scores into the aggregate
            print(f"[!] {scan}: not in pairs_json — skipped")
            continue

        # pairs are scored under a synthetic 'same style as' edge label —
        # independent of the dataset's own predicate vocabulary
        pair_preds = ["same style as"]
        if pairs_rows is not None:
            tri = np.asarray([[a, 0, b]
                              for a, b in pairs_rows]).reshape(-1, 3)
        else:
            # fall back: all pairs (sdf exports don't carry triples); the
            # metric is a mean over pairs either way
            n = len(sdfs)
            tri = np.asarray([[i, 0, j]
                              for i in range(n) for j in range(i + 1, n)])
        if len(tri) == 0 or len(sdfs) < 2:
            continue
        res = consistency_scores(sdfs[..., 0] if sdfs.ndim == 5 else sdfs,
                                 tri, pair_preds,
                                 n_points=args.n_points)
        agg["consistency_pairs"] += res.get("consistency_pairs", 0)
        if "consistency_feature_cos" in res:
            agg["consistency_feature_cos"].append(res["consistency_feature_cos"])
            agg["consistency_chamfer"].append(res["consistency_chamfer"])

    out = {"consistency_pairs": agg["consistency_pairs"],
           "consistency_feature_cos": float(np.mean(agg["consistency_feature_cos"]))
           if agg["consistency_feature_cos"] else float("nan"),
           "consistency_chamfer": float(np.mean(agg["consistency_chamfer"]))
           if agg["consistency_chamfer"] else float("nan"),
           "scans": len(files)}
    report = {k: (round(v, 5) if isinstance(v, float) else v)
              for k, v in out.items()}
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
