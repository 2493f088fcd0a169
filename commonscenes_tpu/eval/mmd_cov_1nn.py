"""Object-level fidelity metrics: MMD / Coverage / 1-NN accuracy (+ JSD).

Capability parity with the PointFlow-protocol suite in reference
scripts/compute_mmd_cov_1nn.py: pairwise CD/EMD matrices (:110-150),
lgan_mmd_cov (:186-198), the 1-NN two-sample test (:154-183), and the
voxel-occupancy JSD (:256-350).

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
    argmin_per_sample = d.argmin(axis=1)
    mmd = float(min_per_ref.mean())
    cov = float(len(np.unique(argmin_per_sample)) / d.shape[1])
    return {"mmd": mmd, "cov": cov}


def knn_1nn_accuracy(dxx: np.ndarray, dxy: np.ndarray,
                     dyy: np.ndarray) -> Dict[str, float]:
    """Leave-one-out 1-NN two-sample test (compute_mmd_cov_1nn.py:154-183).
    x = references, y = samples; 0.5 ≙ indistinguishable."""
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
            "1nn_acc": float(0.5 * (acc_x + acc_y))}


def compute_all_metrics(sample_pcs: jax.Array, ref_pcs: jax.Array,
                        use_emd: bool = True,
                        use_pallas: bool = True) -> Dict[str, float]:
    """Full PointFlow battery (compute_mmd_cov_1nn.py:201-229)."""
    results: Dict[str, float] = {}
    d_sr = pairwise_cd_matrix(sample_pcs, ref_pcs, use_pallas)
    res = mmd_cov(d_sr)
    results["mmd_cd"] = res["mmd"]
    results["cov_cd"] = res["cov"]

    d_ss = pairwise_cd_matrix(sample_pcs, sample_pcs, use_pallas)
    d_rr = pairwise_cd_matrix(ref_pcs, ref_pcs, use_pallas)
    results.update({f"{k}_cd": v for k, v in
                    knn_1nn_accuracy(d_rr, d_sr.T, d_ss).items()})

    if use_emd:
        e_sr = pairwise_emd_matrix(sample_pcs, ref_pcs)
        res = mmd_cov(e_sr)
        results["mmd_emd"] = res["mmd"]
        results["cov_emd"] = res["cov"]
    return results


def jsd_between_point_cloud_sets(sample_pcs: np.ndarray, ref_pcs: np.ndarray,
                                 resolution: int = 28) -> float:
    """Voxel-occupancy Jensen-Shannon divergence
    (compute_mmd_cov_1nn.py:256-350), numpy host-side."""
    def occupancy(pcs):
        grid = np.zeros((resolution,) * 3, np.float64)
        half = resolution / 2.0
        for pc in pcs:
            idx = np.clip(((pc + 1.0) * half).astype(int), 0, resolution - 1)
            g = np.zeros_like(grid)
            g[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
            grid += g
        return grid / len(pcs)

    p = occupancy(np.asarray(sample_pcs)).ravel()
    q = occupancy(np.asarray(ref_pcs)).ravel()

    def entropy_term(a, b):
        m = 0.5 * (a + b)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = a * (np.log(a) - np.log(m))
        return np.where(a > 0, t, 0.0).sum()

    return float(0.5 * (entropy_term(p, q) + entropy_term(q, p)))
