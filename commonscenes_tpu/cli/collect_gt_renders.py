"""Collect ground-truth top-down scene renders for the FID/KID real set.

Capability parity with reference scripts/collect_gt_sdf_images.py:48-158:
render each GT scene orthographically from above (camera height 8, 256²,
without-lamp / no-stool filtering flags) into PNGs consumed by the FID
pipeline. Meshes come from per-object SDF grids (marching tetrahedra) or
fall back to box geometry when SDFs are absent.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def box_mesh(box, angle_deg: float = 0.0):
    """Solid-box proxy mesh (shared helper in eval/scene_export.py)."""
    from commonscenes_tpu.eval.scene_export import solid_box_mesh
    return solid_box_mesh(box, angle_deg=angle_deg)


def main(argv=None):
    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--out", required=True)
    p.add_argument("--num_scenes", type=int, default=64)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--extent", type=float, default=8.0,
                   help="world extent covered (camera-height-8, fov-90 ≙ 16;"
                        " renders crop to the populated area)")
    p.add_argument("--without_lamp", action="store_true")
    p.add_argument("--no_stool", action="store_true")
    p.add_argument("--sdf_out", default="",
                   help="also dump GT SDF grids as <scan>_sdf.npz + "
                        "layouts.json — the reference set for "
                        "cli/compute_mmd_cov_1nn.py (PointFlow protocol, "
                        "reference compute_mmd_cov_1nn.py:417-449)")
    args = p.parse_args(argv)

    from commonscenes_tpu.data.synthetic import denormalize_boxes
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.eval.scene_export import (fit_vertices_to_box,
                                                    render_topdown, save_png,
                                                    angle_bin_to_degrees)
    from commonscenes_tpu.ops.mesh import marching_tetrahedra

    if args.dataset == "synthetic":
        from commonscenes_tpu.data.synthetic import SyntheticDataset
        vocab = Vocab.synthetic()
        ds = SyntheticDataset(vocab, num_scenes=args.num_scenes, sdf_res=32,
                              with_clip=False)
    else:
        from commonscenes_tpu.data.sgfront import SGFrontDataset
        ds = SGFrontDataset(args.dataset, "test", args.room_type,
                            use_sdf=True, with_clip=False)
        vocab = ds.vocab

    skip = set()
    if args.without_lamp:
        skip.add("lamp")
    if args.no_stool:
        skip.add("stool")
    skip_ids = {vocab.class_to_idx[c] for c in skip if c in vocab.class_to_idx}
    root = vocab.scene_class_id

    os.makedirs(args.out, exist_ok=True)
    if args.sdf_out:
        os.makedirs(args.sdf_out, exist_ok=True)
    gt_layouts = []
    # per-split denormalization stats (same policy as eval_3dfront — GT and
    # generated layouts must live in the same coordinate scale for FID)
    box_mean = getattr(ds, "box_mean", None)
    box_std = getattr(ds, "box_std", None)
    for i in range(min(args.num_scenes, len(ds))):
        scene = ds[i]
        if args.sdf_out and scene.sdfs is not None \
                and scene.has_sdf is not None:
            gt_slots = [k for k in range(scene.num_objs)
                        if scene.has_sdf[k]]
            if gt_slots:
                np.savez_compressed(
                    os.path.join(args.sdf_out, f"{scene.scan_id}_sdf.npz"),
                    sdf=np.asarray(scene.sdfs, np.float32)[gt_slots],
                    slots=np.asarray(gt_slots, np.int32))
                entry = {"scan_id": scene.scan_id,
                         "objs": np.asarray(scene.objs).tolist()}
                if getattr(scene, "instance_ids", None) is not None:
                    # slot -> dataset instance id (consistency_check maps
                    # the reference's instance-id pair lists through this)
                    entry["instance_ids"] = np.asarray(
                        scene.instance_ids).tolist()
                gt_layouts.append(entry)
        boxes = denormalize_boxes(scene.boxes, mean=box_mean, std=box_std)
        meshes, classes = [], []
        for k in range(scene.num_objs):
            c = int(scene.objs[k])
            if c == root or c in skip_ids:
                continue
            angle = angle_bin_to_degrees(int(scene.angles[k]))
            if scene.sdfs is not None and scene.has_sdf is not None \
                    and scene.has_sdf[k]:
                v, f = marching_tetrahedra(scene.sdfs[k], level=0.02)
                if len(f) == 0:
                    v, f = box_mesh(boxes[k], angle_deg=angle)
                else:
                    v = fit_vertices_to_box(v, boxes[k], angle_deg=angle)
            else:
                v, f = box_mesh(boxes[k], angle_deg=angle)
            meshes.append((v, f))
            classes.append(c)
        img = render_topdown(meshes, classes, resolution=args.resolution,
                             extent=args.extent)
        save_png(os.path.join(args.out, f"{scene.scan_id}.png"), img)
    if args.sdf_out and gt_layouts:
        import json
        with open(os.path.join(args.sdf_out, "layouts.json"), "w") as f:
            json.dump(gt_layouts, f)
        print(f"[*] wrote {len(gt_layouts)} GT SDF sets to {args.sdf_out}")
    print(f"[*] wrote {min(args.num_scenes, len(ds))} renders to {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
