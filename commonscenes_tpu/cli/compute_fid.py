"""FID/KID between two top-down render directories.

Capability parity with reference scripts/compute_fid_scores_3dfront.py: the
real set comes from `cli/collect_gt_renders.py`, the fake set from eval
exports; scenes are filtered by room-type prefix (:96-116) and scored with
FID + KID (cleanfid semantics; see eval/fid.py for the offline feature
policy).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def load_dir(path: str, room_type: str = "", limit: int = 0) -> np.ndarray:
    from commonscenes_tpu.data.splits import filter_scenes_by_room
    from commonscenes_tpu.eval.scene_export import load_png
    files = sorted(glob.glob(os.path.join(path, "*.png")))
    if room_type:
        names = [os.path.splitext(os.path.basename(f))[0] for f in files]
        keep = set(filter_scenes_by_room(names, room_type))
        files = [f for f, n in zip(files, names) if n in keep]
        if not files:
            # never silently fall back to the unfiltered directory — a
            # cross-room FID labeled as room-filtered is worse than an error
            raise SystemExit(
                f"room_type={room_type!r} matched 0 of {len(names)} PNGs "
                f"in {path}")
    if limit:
        files = files[:limit]
    if not files:
        raise SystemExit(f"no PNGs found in {path}")
    return np.stack([load_png(f) for f in files])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path_gt", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--room_type", default="")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--out", default="",
                   help="write the report as valid JSON to this file")
    args = p.parse_args(argv)

    from commonscenes_tpu.eval.fid import compute_fid_kid
    real = load_dir(args.path_gt, args.room_type, args.limit)
    fake = load_dir(args.path_pred, args.room_type, args.limit)
    res = compute_fid_kid(real, fake)
    res["n_real"], res["n_fake"] = len(real), len(fake)
    report = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in res.items()}
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return res


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
