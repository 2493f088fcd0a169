"""FID / KID over top-down scene renders.

Capability parity with reference scripts/compute_fid_scores_3dfront.py
(cleanfid over 256×256 top-down renders, room filtering by scene-name
prefix :68,96-116). cleanfid + InceptionV3 weights require downloads this
environment can't make, so the metric math (Fréchet distance, polynomial-
kernel KID) is implemented here over a pluggable feature extractor:

1. cleanfid/torch Inception if importable AND weights are cached locally;
2. otherwise a fixed random-patch projection feature (documented proxy —
   deterministic, scale/shift sensitive, adequate for relative tracking).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np
from scipy import linalg


# ---------------------------------------------------------------------------
# metric math
# ---------------------------------------------------------------------------


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Standard FID formula (matches cleanfid's computation)."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(feat1: np.ndarray, feat2: np.ndarray) -> float:
    mu1, s1 = feat1.mean(0), np.cov(feat1, rowvar=False)
    mu2, s2 = feat2.mean(0), np.cov(feat2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def kid_from_features(feat1: np.ndarray, feat2: np.ndarray,
                      n_subsets: int = 10, subset_size: Optional[int] = None,
                      seed: int = 0) -> float:
    """Polynomial-kernel MMD² (the KID estimator used by cleanfid)."""
    rng = np.random.RandomState(seed)
    n = subset_size or min(len(feat1), len(feat2), 1000)
    d = feat1.shape[1]

    def poly(a, b):
        return (a @ b.T / d + 1.0) ** 3

    vals = []
    for _ in range(n_subsets):
        x = feat1[rng.choice(len(feat1), n, replace=len(feat1) < n)]
        y = feat2[rng.choice(len(feat2), n, replace=len(feat2) < n)]
        kxx = poly(x, x)
        kyy = poly(y, y)
        kxy = poly(x, y)
        m = n
        vals.append(
            (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
            - 2 * kxy.mean())
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


def random_patch_features(images: np.ndarray, dim: int = 512,
                          seed: int = 1234) -> np.ndarray:
    """Deterministic proxy features: overlapping 16×16 patch means projected
    by a fixed Gaussian matrix. Sensitive to layout, color and coverage."""
    imgs = np.asarray(images, np.float32)
    if imgs.ndim == 3:
        imgs = imgs[None]
    B, H, W, C = imgs.shape
    ph = H // 16
    patches = imgs.reshape(B, 16, ph, 16, W // 16, C).mean(axis=(2, 4))
    flat = patches.reshape(B, -1)
    rng = np.random.RandomState(seed)
    proj = rng.randn(flat.shape[1], dim).astype(np.float32) / np.sqrt(flat.shape[1])
    return flat @ proj


def get_feature_extractor() -> tuple:
    """Prefer a real Inception backbone when available offline.

    Returns ``(extract_fn, name)`` so callers can label which extractor
    produced the numbers (inception numbers are paper-comparable, the
    patch-proxy ones are only comparable to each other).
    """
    try:
        from cleanfid.features import build_feature_extractor  # type: ignore
        model = build_feature_extractor("clean", device="cpu")

        def extract(images: np.ndarray) -> np.ndarray:
            import torch
            x = torch.from_numpy(
                (np.asarray(images) * 255).astype(np.uint8).transpose(0, 3, 1, 2))
            return model(x.float()).cpu().numpy()

        return extract, "cleanfid-inception"
    except Exception:
        return random_patch_features, "patch-proxy"


def compute_fid_kid(real_images: np.ndarray, fake_images: np.ndarray,
                    extractor: Optional[Callable] = None) -> Dict[str, float]:
    """[N, 256, 256, 3] float images in [0,1] → {'fid': …, 'kid': …,
    'feature_extractor': …}."""
    if extractor is not None:
        extract, name = extractor, getattr(extractor, "__name__", "custom")
    else:
        extract, name = get_feature_extractor()
    f_real = extract(real_images)
    f_fake = extract(fake_images)
    return {"fid": fid_from_features(f_real, f_fake),
            "kid": kid_from_features(f_real, f_fake),
            "feature_extractor": name}
