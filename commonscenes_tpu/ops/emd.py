"""Approximate Earth Mover's Distance between equal-size point clouds.

Replaces the reference CUDA approxmatch kernel
(scripts/pytorch_structural_losses/src/approxmatch.cu, wrapped at
scripts/pytorch_structural_losses/match_cost.py) and its Hungarian torch
fallback (scripts/compute_mmd_cov_1nn.py:35-52).

TPU design: entropic-regularized Sinkhorn iterations — each iteration is
two [N, M] row/col normalizations over a distance matrix computed as one
MXU matmul; `lax.scan` unrolls the fixed iteration count into one program.
An exact Hungarian path (scipy) is provided for small clouds / parity
checks on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_dist(x: jax.Array, y: jax.Array, squared: bool = False) -> jax.Array:
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    return d2 if squared else jnp.sqrt(d2 + 1e-12)


def emd_sinkhorn(x: jax.Array, y: jax.Array, epsilon: float = 0.02,
                 iters: int = 50, squared: bool = False) -> jax.Array:
    """Entropic-OT approximation of EMD. x,y [B,N,3] → cost [B].

    epsilon is relative to the median distance scale for stability.
    """
    C = _pairwise_dist(x, y, squared=squared)              # [B, N, M]
    B, N, M = C.shape
    scale = jnp.median(C.reshape(B, -1), axis=1)[:, None, None] + 1e-9
    Cn = C / scale
    eps = epsilon

    log_mu = -jnp.log(N) * jnp.ones((B, N))
    log_nu = -jnp.log(M) * jnp.ones((B, M))
    f = jnp.zeros((B, N))
    g = jnp.zeros((B, M))

    def body(carry, _):
        f, g = carry
        # log-domain Sinkhorn updates
        f = eps * (log_mu - jax.nn.logsumexp(
            (g[:, None, :] - Cn) / eps, axis=2)) + 0.0
        g = eps * (log_nu - jax.nn.logsumexp(
            (f[:, :, None] - Cn) / eps, axis=1))
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (f, g), None, length=iters)
    P = jnp.exp((f[:, :, None] + g[:, None, :] - Cn) / eps)  # [B, N, M]
    cost = jnp.sum(P * C, axis=(1, 2))
    # mean matched distance — the reference convention: the torch fallback
    # takes .mean() over matched pairs (compute_mmd_cov_1nn.py:35-52) and
    # the CUDA match_cost sum is divided by N at the call site (:57-66)
    return cost / jnp.maximum(jnp.sum(P, axis=(1, 2)), 1e-9)


def emd_hungarian(x: np.ndarray, y: np.ndarray,
                  squared: bool = False) -> np.ndarray:
    """Exact assignment EMD via scipy (host-side; parity/golden tests).
    Mean matched distance, like the reference's emd_approx
    (compute_mmd_cov_1nn.py:35-52)."""
    from scipy.optimize import linear_sum_assignment
    out = []
    for xb, yb in zip(x, y):
        d = ((xb[:, None, :] - yb[None, :, :]) ** 2).sum(-1)
        if not squared:
            d = np.sqrt(np.maximum(d, 0))
        r, c = linear_sum_assignment(d)
        out.append(d[r, c].mean())
    return np.asarray(out, np.float32)
