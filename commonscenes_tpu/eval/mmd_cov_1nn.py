"""Object-level fidelity metrics: MMD / Coverage / 1-NN accuracy (+ JSD).

Numeric parity with the PointFlow-protocol suite in reference
scripts/compute_mmd_cov_1nn.py: pairwise CD/EMD matrices (:110-150),
lgan_mmd_cov (:186-198), the 1-NN two-sample test (:154-183), and the
sphere-clipped occupancy-grid JSD (:232-350, latent_3d_points protocol).

The pairwise distance matrices run on device via the Pallas/XLA chamfer and
Sinkhorn EMD kernels; the final statistics are tiny and computed in numpy.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.ops.chamfer import chamfer_distance
from commonscenes_tpu.ops.emd import emd_sinkhorn


def pairwise_cd_matrix(sample: jax.Array, ref: jax.Array,
                       use_pallas: bool = True) -> np.ndarray:
    """[Ns,P,3] × [Nr,P,3] → [Ns,Nr] chamfer matrix (single implementation
    lives in ops/chamfer.py next to the kernel and its parity tests)."""
    from commonscenes_tpu.ops.chamfer import pairwise_chamfer_matrix
    return np.asarray(pairwise_chamfer_matrix(sample, ref,
                                              use_pallas=use_pallas))


def pairwise_emd_matrix(sample: jax.Array, ref: jax.Array,
                        epsilon: float = 0.02, iters: int = 30) -> np.ndarray:
    def row(s):
        return emd_sinkhorn(jnp.broadcast_to(s[None], ref.shape), ref,
                            epsilon=epsilon, iters=iters)
    return np.asarray(jax.lax.map(row, sample))


def mmd_cov(dist_matrix: np.ndarray) -> Dict[str, float]:
    """lgan_mmd_cov (compute_mmd_cov_1nn.py:186-198): rows = samples,
    cols = references."""
    d = np.asarray(dist_matrix)
    min_per_ref = d.min(axis=0)          # best sample for each reference
    min_per_sample = d.min(axis=1)
    argmin_per_sample = d.argmin(axis=1)
    mmd = float(min_per_ref.mean())
    cov = float(len(np.unique(argmin_per_sample)) / d.shape[1])
    return {"mmd": mmd, "cov": cov,
            "mmd_smp": float(min_per_sample.mean())}


def knn_1nn_accuracy(dxx: np.ndarray, dxy: np.ndarray,
                     dyy: np.ndarray) -> Dict[str, float]:
    """Leave-one-out 1-NN two-sample test (compute_mmd_cov_1nn.py:154-183).
    x = references, y = samples; 0.5 ≙ indistinguishable. The overall
    accuracy is count-weighted over all nx+ny points like the reference's
    ``torch.eq(label, pred).float().mean()`` (:181), NOT the macro average
    of the per-class accuracies."""
    nx, ny = dxx.shape[0], dyy.shape[0]
    big = 1e18
    top = np.block([[dxx + np.eye(nx) * big, dxy],
                    [dxy.T, dyy + np.eye(ny) * big]])
    labels = np.concatenate([np.ones(nx), np.zeros(ny)])
    nn_idx = top.argmin(axis=1)
    pred = labels[nn_idx]
    acc_x = float((pred[:nx] == 1).mean())
    acc_y = float((pred[nx:] == 0).mean())
    return {"1nn_acc_real": acc_x, "1nn_acc_fake": acc_y,
            "1nn_acc": float((pred == labels).mean())}


def compute_all_metrics(sample_pcs: jax.Array, ref_pcs: jax.Array,
                        use_emd: bool = True,
                        use_pallas: bool = True) -> Dict[str, float]:
    """Full PointFlow battery (compute_mmd_cov_1nn.py:201-229): MMD/COV +
    1-NN for CD, and for EMD when ``use_emd``."""
    results: Dict[str, float] = {}
    d_sr = pairwise_cd_matrix(sample_pcs, ref_pcs, use_pallas)
    res = mmd_cov(d_sr)
    results["mmd_cd"] = res["mmd"]
    results["cov_cd"] = res["cov"]
    results["mmd_smp_cd"] = res["mmd_smp"]

    d_ss = pairwise_cd_matrix(sample_pcs, sample_pcs, use_pallas)
    d_rr = pairwise_cd_matrix(ref_pcs, ref_pcs, use_pallas)
    results.update({f"{k}_cd": v for k, v in
                    knn_1nn_accuracy(d_rr, d_sr.T, d_ss).items()})

    if use_emd:
        e_sr = pairwise_emd_matrix(sample_pcs, ref_pcs)
        res = mmd_cov(e_sr)
        results["mmd_emd"] = res["mmd"]
        results["cov_emd"] = res["cov"]
        results["mmd_smp_emd"] = res["mmd_smp"]
        e_ss = pairwise_emd_matrix(sample_pcs, sample_pcs)
        e_rr = pairwise_emd_matrix(ref_pcs, ref_pcs)
        results.update({f"{k}_emd": v for k, v in
                        knn_1nn_accuracy(e_rr, e_sr.T, e_ss).items()})
    return results


def _unit_cube_grid(resolution: int, clip_sphere: bool = True):
    """Cell-center grid over [-0.5, 0.5]³ with spacing 1/(res-1); corner
    cells outside the radius-0.5 sphere dropped
    (unit_cube_grid_point_cloud, compute_mmd_cov_1nn.py:235-253)."""
    ax = np.arange(resolution, dtype=np.float64) / (resolution - 1) - 0.5
    grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    if clip_sphere:
        kept = np.linalg.norm(grid, axis=1) <= 0.5
        return grid[kept], kept
    return grid, np.ones(len(grid), bool)


def _occupancy_counts(pcs: np.ndarray, resolution: int) -> np.ndarray:
    """Total point count per kept grid cell, assigning each point to its
    nearest cell center among the sphere-clipped set
    (entropy_of_occupancy_grid, compute_mmd_cov_1nn.py:270-307)."""
    centers, kept = _unit_cube_grid(resolution, clip_sphere=True)
    full_to_kept = np.full(resolution ** 3, -1, np.int64)
    full_to_kept[np.flatnonzero(kept)] = np.arange(kept.sum())

    pts = np.asarray(pcs, np.float64).reshape(-1, 3)
    # nearest FULL-grid center = independent per-axis rounding; when that
    # center survived the sphere clip it is also the nearest kept center
    idx = np.clip(np.rint((pts + 0.5) * (resolution - 1)).astype(np.int64),
                  0, resolution - 1)
    flat = (idx[:, 0] * resolution + idx[:, 1]) * resolution + idx[:, 2]
    nearest = full_to_kept[flat]
    miss = nearest < 0
    if miss.any():
        # the rounded center was a clipped corner cell: exact NN over the
        # kept centers for those boundary points only
        d = ((pts[miss, None, :] - centers[None, :, :]) ** 2).sum(-1)
        nearest[miss] = d.argmin(axis=1)
    return np.bincount(nearest, minlength=len(centers)).astype(np.float64)


def _entropy_bits(p: np.ndarray) -> float:
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def jsd_between_point_cloud_sets(sample_pcs: np.ndarray, ref_pcs: np.ndarray,
                                 resolution: int = 28) -> float:
    """latent_3d_points JSD (compute_mmd_cov_1nn.py:256-350): each set's
    points are binned to the nearest center of the sphere-clipped unit-cube
    grid, the two TOTAL-COUNT distributions are normalized, and their
    Jensen-Shannon divergence is returned in bits.

    Clouds should live in the unit sphere (|p| ≤ 0.5). The reference's
    per-cloud ``normalization`` produces [-1, 1] clouds, but its driver
    never invokes JSD (:417-449 runs only compute_all_metrics) — callers
    here scale by 0.5 to honor the published protocol.
    """
    p = _occupancy_counts(np.asarray(sample_pcs), resolution)
    q = _occupancy_counts(np.asarray(ref_pcs), resolution)
    p = p / max(p.sum(), 1e-12)
    q = q / max(q.sum(), 1e-12)
    return _entropy_bits(0.5 * (p + q)) - 0.5 * (_entropy_bits(p) +
                                                 _entropy_bits(q))
