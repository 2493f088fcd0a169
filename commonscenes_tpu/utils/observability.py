"""Training observability: metric logging, phase timing, device profiling,
host-memory probing.

Capability parity with the reference's observability surface:
* tensorboardX scalars + loss_log.txt (model/diff_utils/visualizer.py:48-143,
  train_3dfront.py:433-449) → ``MetricLogger`` (JSONL + console + optional
  TensorBoard when tensorboardX/tensorboard is importable);
* per-iteration wall-clock (visualizer.py:80-91) → ``PhaseTimer``;
* /proc/meminfo probe gating in-RAM caches (helpers/psutil.py FreeMemLinux)
  → ``free_memory_gb``;
* plus a TPU upgrade the reference lacks: ``trace`` wraps a block in
  jax.profiler for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.loss_log = open(os.path.join(log_dir, "loss_log.txt"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self.tb = SummaryWriter(log_dir)
            except Exception:
                try:
                    from torch.utils.tensorboard import SummaryWriter  # type: ignore
                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        row = {"step": step,
               **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def message(self, text: str):
        print(text)
        self.loss_log.write(text + "\n")
        self.loss_log.flush()

    def close(self):
        self.jsonl.close()
        self.loss_log.close()
        if self.tb is not None:
            self.tb.close()


class PhaseTimer:
    """Accumulating wall-clock timers per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {f"{k}_ms": 1000 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def free_memory_gb() -> float:
    """MemAvailable from /proc/meminfo in GB (helpers/psutil.py semantics)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) / (1024 ** 2)
    except OSError:
        pass
    return 0.0


class SampleVisualizer:
    """Training-time visual observability (reference gen_shape_after_foward,
    model/sdfusion_txt2shape_model.py:368-387 + train_3dfront.py:442-446:
    every N steps render generated-vs-GT shapes).

    Holds one jitted short-DDIM sampling program (compiled on first use) and
    writes top-down PNGs of the generated scene (predicted boxes + generated
    SDF meshes) next to the ground truth under ``<out_dir>/vis``.
    """

    def __init__(self, model, out_dir: str, scene_class_id: int,
                 ddim_steps: int = 7, max_shapes: int = 4,
                 box_mean=None, box_std=None):
        import os
        self.model = model
        self.dir = os.path.join(out_dir, "vis")
        os.makedirs(self.dir, exist_ok=True)
        self.scene_class_id = scene_class_id
        self.max_shapes = max_shapes
        self.box_mean, self.box_std = box_mean, box_std
        from commonscenes_tpu.diffusion.schedule import make_ddim_tables
        self._tables = make_ddim_tables(model.sched, ddim_steps)
        self._jitted = None

    def _fn(self):
        import jax
        if self._jitted is None:
            def f(variables, batch, key, slots):
                return self.model.manipulate_sample(
                    variables, batch, key, gen_shape=True,
                    shape_slot_idx=slots, ddim_tables=self._tables)
            self._jitted = jax.jit(f)
        return self._jitted

    def __call__(self, variables, batch, key, step: int) -> str:
        import numpy as np
        from commonscenes_tpu.data.synthetic import denormalize_boxes
        from commonscenes_tpu.eval.sampling import pack_slots
        from commonscenes_tpu.eval.scene_export import (
            angle_bin_to_degrees, fit_vertices_to_box, render_topdown,
            save_png)
        from commonscenes_tpu.ops.mesh import marching_tetrahedra

        slots, n_real = pack_slots(batch.dec.objs, batch.dec.obj_mask,
                                   self.scene_class_id,
                                   bucket=self.max_shapes,
                                   cap=self.max_shapes)
        import jax.numpy as jnp
        out = self._fn()(variables, batch, key, jnp.asarray(slots))

        boxes_d = denormalize_boxes(np.asarray(out["boxes"], np.float32),
                                    mean=self.box_mean, std=self.box_std)
        angles = np.asarray(out["angles"]).argmax(1)
        sdfs = np.asarray(out["sdf"], np.float32)[..., 0]
        objs_flat = np.asarray(batch.dec.objs).reshape(-1)

        def scene_meshes(sdf_source):
            meshes, classes = [], []
            for k in range(min(n_real, self.max_shapes)):
                slot = int(slots[k])
                vv, ff = marching_tetrahedra(sdf_source[k], level=0.02)
                if len(ff) == 0:
                    continue
                vv = fit_vertices_to_box(
                    vv, boxes_d[slot],
                    angle_deg=angle_bin_to_degrees(int(angles[slot])))
                meshes.append((vv, ff))
                classes.append(int(objs_flat[slot]))
            return meshes, classes

        gen_m, gen_c = scene_meshes(sdfs)
        panels = []
        if gen_m:
            panels.append(render_topdown(gen_m, gen_c, resolution=128))
        if batch.shapes is not None:
            gt_sdf = np.asarray(batch.shapes.sdf, np.float32)[..., 0]
            gt_slots = (np.asarray(batch.shapes.scene_idx)
                        * batch.dec.objs.shape[1]
                        + np.asarray(batch.shapes.slot_idx))
            # the GT reference panel is laid out with the GROUND-TRUTH
            # boxes/angles — placing GT shapes at predicted positions would
            # make the comparison panel garbage during warm-up
            gt_boxes_d = denormalize_boxes(
                np.asarray(batch.dec.boxes, np.float32).reshape(
                    -1, batch.dec.boxes.shape[-1]),
                mean=self.box_mean, std=self.box_std)
            gt_angles = np.asarray(batch.dec.angles).reshape(-1)
            gt_m, gt_c = [], []
            for k in range(min(len(gt_slots), self.max_shapes)):
                if float(np.asarray(batch.shapes.mask)[k]) == 0:
                    continue
                vv, ff = marching_tetrahedra(gt_sdf[k], level=0.02)
                if len(ff) == 0:
                    continue
                slot = int(gt_slots[k])
                vv = fit_vertices_to_box(
                    vv, gt_boxes_d[slot],
                    angle_deg=angle_bin_to_degrees(int(gt_angles[slot])))
                gt_m.append((vv, ff))
                gt_c.append(int(objs_flat[slot]))
            if gt_m:
                panels.append(render_topdown(gt_m, gt_c, resolution=128))
        if not panels:
            return ""
        import numpy as np  # noqa: F811
        img = np.concatenate(panels, axis=1)
        path = f"{self.dir}/step_{step:07d}.png"
        save_png(path, img)
        return path
