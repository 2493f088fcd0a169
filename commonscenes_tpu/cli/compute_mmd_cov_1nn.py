"""MMD / Coverage / 1-NN accuracy (+ JSD) between generated and reference
object sets.

Capability parity with reference scripts/compute_mmd_cov_1nn.py:417-449
(PointFlow protocol): per-category object point clouds (5000 pts, ≤116
objects/category) from exported SDF grids, pairwise CD (+ Sinkhorn EMD)
matrices on device, metric battery per category and overall.

Inputs: directories of ``*_sdf.npz`` (from cli/eval_3dfront.py exports for
the sample set; GT grids can be exported the same way or synthesized).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

try:
    import ml_dtypes  # noqa: F401  (register bfloat16 before np.load)
except ImportError:
    pass


def load_sdf_dir(path: str):
    """→ dict class_id → [K, R, R, R] grids (class from layouts.json when
    present, else one bucket)."""
    layouts = {}
    lj = os.path.join(path, "layouts.json")
    if os.path.exists(lj):
        with open(lj) as f:
            for entry in json.load(f):
                layouts[entry["scan_id"]] = entry
    out = defaultdict(list)
    for f in sorted(glob.glob(os.path.join(path, "*_sdf.npz"))):
        scan = os.path.basename(f)[:-len("_sdf.npz")]
        data = np.load(f)
        sdfs = np.asarray(data["sdf"])
        if sdfs.dtype.kind == "V":
            sdfs = sdfs.view(ml_dtypes.bfloat16)
        sdfs = sdfs.astype(np.float32)
        if sdfs.ndim == 5:
            sdfs = sdfs[..., 0]
        slots = data["slots"] if "slots" in data else None
        classes = None
        if scan in layouts and slots is not None:
            objs = layouts[scan]["objs"]
            # sdf rows are PACKED: row k belongs to scene slot slots[k],
            # and layouts.json "objs" is indexed by slot — map through it
            # (a clamped row index would mislabel any scene where packed
            # rows don't coincide with 0..n-1)
            classes = [objs[int(s)] if int(s) < len(objs) else 0
                       for s in slots[:len(sdfs)]]
        for k in range(len(sdfs)):
            cls = classes[k] if classes else 0
            out[cls].append(sdfs[k])
    return {c: np.stack(v) for c, v in out.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path_sample", required=True)
    p.add_argument("--path_ref", required=True)
    p.add_argument("--n_points", type=int, default=5000)
    p.add_argument("--max_per_category", type=int, default=116)
    p.add_argument("--use_emd", action="store_true")
    p.add_argument("--per_category", action="store_true")
    p.add_argument("--out", default="",
                   help="write the report as valid JSON to this file")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from commonscenes_tpu.eval.mmd_cov_1nn import (compute_all_metrics,
                                                   jsd_between_point_cloud_sets)
    from commonscenes_tpu.ops.mesh import sdf_to_vertex_cloud

    sample = load_sdf_dir(args.path_sample)
    ref = load_sdf_dir(args.path_ref)

    def clouds(grids):
        # the reference driver reseeds np.random per cloud (sample_pc,
        # compute_mmd_cov_1nn.py:372-380) and mean-centers / max-abs-scales
        # each cloud to [-1, 1] (normalization, :395-401)
        return np.stack([
            sdf_to_vertex_cloud(np.asarray(g), args.n_points,
                                rng=np.random.RandomState(42),
                                normalize="mean_maxabs")
            for g in grids[:args.max_per_category]])

    results = {}
    cats = sorted(set(sample) & set(ref)) if args.per_category else [None]
    all_s, all_r = [], []
    for c in cats:
        s_grids = sample[c] if c is not None else np.concatenate(
            [v for v in sample.values()])
        r_grids = ref[c] if c is not None else np.concatenate(
            [v for v in ref.values()])
        pcs_s = clouds(s_grids)
        pcs_r = clouds(r_grids)
        all_s.append(pcs_s)
        all_r.append(pcs_r)
        res = compute_all_metrics(jnp.asarray(pcs_s), jnp.asarray(pcs_r),
                                  use_emd=args.use_emd)
        key = f"cat_{c}" if c is not None else "all"
        results[key] = {k: round(float(v), 6) for k, v in res.items()}

    # JSD's occupancy grid lives in the unit sphere (latent_3d_points
    # protocol); the [-1,1]-normalized clouds scale down by 0.5 first
    results["jsd"] = round(jsd_between_point_cloud_sets(
        0.5 * np.concatenate(all_s), 0.5 * np.concatenate(all_r)), 6)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
