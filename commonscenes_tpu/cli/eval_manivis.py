"""Manipulation visual evaluation — the reference
``scripts/eval_3dfront_manivis.py`` capability on the TPU-native stack
(that script is bit-rotted upstream: it imports a nonexistent
``model.atlasnet``; see SURVEY "Known bit-rot").

For each test scene and manipulation mode it produces, side by side:
* the ORIGINAL scene graph (DOT) and the MANIPULATED graph with the
  changed/added nodes highlighted;
* a top-down render of the PREDICTED layout after the manipulation
  (rotated box proxies; regenerated shape meshes are exported as OBJ by the
  underlying eval when --gen_shape);
* an SCA-changes score table over all exported scenes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _box_mesh():
    """Unit cube fitted later by fit_vertices_to_box: verts in [-0.5, 0.5]."""
    v = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
                  for z in (-0.5, 0.5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def main(argv=None):
    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", default="./experiments/layout_test")
    p.add_argument("--epoch", type=int, default=90)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--num_scenes", type=int, default=8)
    p.add_argument("--modes", default="relationship,addition")
    p.add_argument("--gen_shape", default=False,
                   type=lambda s: s.lower() in ("1", "true", "yes"))
    p.add_argument("--out", default="./manivis_out")
    p.add_argument("--seed", type=int, default=47)
    args = p.parse_args(argv)

    from commonscenes_tpu.cli import eval_3dfront as ev

    os.makedirs(args.out, exist_ok=True)
    summaries = {}
    for mode in args.modes.split(","):
        mode = mode.strip()
        mode_dir = os.path.join(args.out, mode)
        os.makedirs(mode_dir, exist_ok=True)
        summary = ev.main([
            "--exp", args.exp, "--epoch", str(args.epoch),
            "--dataset", args.dataset, "--room_type", args.room_type,
            "--num_scenes", str(args.num_scenes),
            "--manipulation", mode,
            "--gen_shape", str(args.gen_shape),
            "--export_dir", mode_dir,
            "--seed", str(args.seed),
        ])
        summaries[mode] = summary

        # render the exported layouts top-down (GT boxes unavailable here;
        # predicted layout render from layouts.json)
        from commonscenes_tpu.eval.scene_export import (render_topdown,
                                                        save_png)
        with open(os.path.join(mode_dir, "layouts.json")) as f:
            layouts = json.load(f)
        for rec in layouts:
            meshes, classes = [], []
            from commonscenes_tpu.eval.scene_export import (
                angle_bin_to_degrees, fit_vertices_to_box)
            root = rec.get("root_class", -1)
            for obj, box, ang in zip(rec["objs"], rec["boxes"],
                                     rec["angles"]):
                if int(obj) == root:
                    continue  # the '_scene_' node has no meaningful box
                v, fc = _box_mesh()
                v = fit_vertices_to_box(
                    v, np.asarray(box, np.float32),
                    angle_deg=angle_bin_to_degrees(int(ang)))
                meshes.append((v, fc))
                classes.append(int(obj))
            if meshes:
                img = render_topdown(meshes, classes, resolution=256)
                save_png(os.path.join(mode_dir,
                                      f"{rec['scan_id']}_layout.png"), img)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summaries, f, indent=2, default=str)
    print(json.dumps({m: {k: v for k, v in s.items()
                          if isinstance(v, (int, float, str))}
                      for m, s in summaries.items()}, indent=2,
                     default=str))
    return summaries


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
