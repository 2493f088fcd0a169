"""Shape-diversity metric: chamfer distance between repeated resamples.

Capability parity with reference scripts/eval_3dfront.py:584-719: for each
object, sample the shape branch ``num_samples`` times, convert SDFs to
normalized 5000-point clouds, and accumulate the chamfer distance between
consecutive runs, reported per fine-grained class and overall. The CUDA
chamfer extension is replaced by the Pallas/XLA kernel (ops.chamfer).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.ops.chamfer import chamfer_distance
from commonscenes_tpu.ops.mesh import sdf_to_vertex_cloud


def sdf_batch_to_point_clouds(sdfs: np.ndarray, n_points: int = 5000,
                              level: float = 0.018, seed: int = 0,
                              normalize: str | None = "bbox_axis"
                              ) -> np.ndarray:
    """[K, R, R, R(,1)] SDF grids → [K, n_points, 3] normalized clouds.

    Protocol-exact: resampled mesh VERTICES (eval_3dfront.py:598-616),
    bbox-centered and stretched per axis to [-1, 1] (``normalize``,
    eval_3dfront.py:783-796)."""
    rng = np.random.RandomState(seed)
    out = []
    for k in range(sdfs.shape[0]):
        out.append(sdf_to_vertex_cloud(np.asarray(sdfs[k]), n_points, level,
                                       rng, normalize=normalize))
    return np.stack(out)


def diversity_between_runs(run_sdfs: List[np.ndarray],
                           obj_classes: Optional[np.ndarray] = None,
                           n_points: int = 5000,
                           use_pallas: bool = True) -> Dict[str, float]:
    """Chamfer between consecutive resample runs (eval_3dfront.py:683-704).

    run_sdfs: list of [K, R, R, R] arrays, one per resample run.
    Returns overall mean + optional per-class means.
    """
    per_class: Dict[int, list] = defaultdict(list)
    total: list = []
    clouds = [sdf_batch_to_point_clouds(np.asarray(r), n_points, seed=i)
              for i, r in enumerate(run_sdfs)]
    for a, b in zip(clouds[:-1], clouds[1:]):
        d = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                        use_pallas))
        total.extend(d.tolist())
        if obj_classes is not None:
            for k, dist in enumerate(d):
                per_class[int(obj_classes[k])].append(float(dist))

    out = {"diversity_mean": float(np.mean(total)) if total else float("nan"),
           "diversity_std": float(np.std(total)) if total else float("nan")}
    for cls, vals in per_class.items():
        out[f"diversity_cls_{cls}"] = float(np.mean(vals))
    return out


def box_angle_diversity(run_boxes: List[np.ndarray],
                        run_angles_deg: List[np.ndarray]
                        ) -> Dict[str, float]:
    """Box-parameter and yaw spread across resample runs: per-object
    unbiased std of the DENORMALIZED boxes split into size[:3] /
    location[3:] means, plus the circular std of the decoded angles
    (reference eval_3dfront.py:80-90, report :759-762)."""
    from commonscenes_tpu.eval.constraints import estimate_angular_std
    out: Dict[str, float] = {}
    if len(run_boxes) >= 2:
        boxes = np.stack(run_boxes, axis=1)      # [n_obj, n_runs, 6]
        per_dim = boxes.std(axis=1, ddof=1).mean(axis=0)  # torch.std: ddof=1
        out["diversity_box_size_std"] = float(per_dim[:3].mean())
        out["diversity_box_loc_std"] = float(per_dim[3:].mean())
    if len(run_angles_deg) >= 2:
        angles = np.stack(run_angles_deg, axis=1)  # [n_obj, n_runs]
        out["diversity_angle_std"] = float(np.mean(
            [estimate_angular_std(a) for a in angles]))
    return out
