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
    """Box triangle mesh from (l, h, w, px, py, pz), yawed by angle_deg —
    GT box proxies must carry the same rotation the SDF/predicted meshes
    get, or FID measures a rotation-distribution gap instead of quality."""
    l, h, w, px, py, pz = box[:6]
    xs = np.array([-w / 2, w / 2])
    ys = np.array([0.0, h])
    zs = np.array([-l / 2, l / 2])
    verts = np.array([[x, y, z] for x in xs for y in ys for z in zs])
    if angle_deg:
        from commonscenes_tpu.eval.scene_export import yaw_rotation
        verts = verts @ yaw_rotation(angle_deg).T
    verts += np.array([px, py, pz])
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return verts, faces


def main(argv=None):
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
    # per-split denormalization stats (same policy as eval_3dfront — GT and
    # generated layouts must live in the same coordinate scale for FID)
    box_mean = getattr(ds, "box_mean", None)
    box_std = getattr(ds, "box_std", None)
    for i in range(min(args.num_scenes, len(ds))):
        scene = ds[i]
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
    print(f"[*] wrote {min(args.num_scenes, len(ds))} renders to {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
