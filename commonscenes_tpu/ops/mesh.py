"""SDF-grid → triangle mesh → surface point clouds (host-side numpy).

Capability parity with the reference's mesh path
(model/diff_utils/util_3d.py:194-236 ``sdf_to_mesh``: mcubes marching cubes
at level 0.02, vertices normalized to [-0.5, 0.5]) and the point sampling
feeding the diversity / MMD metrics (scripts/eval_3dfront.py:584-719,
trimesh.sample). Neither mcubes nor trimesh is assumed: iso-surface
extraction is a fully vectorized numpy *marching tetrahedra* (table-free,
same watertight guarantees, ~2× triangle count), and sampling is
area-weighted barycentric.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 6-tetrahedra decomposition of a cube (corner indices, consistent winding)
_TETS = np.array([
    [0, 5, 1, 6],
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
], np.int64)

# cube corner offsets (x, y, z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int64)


def marching_tetrahedra(sdf: np.ndarray, level: float = 0.02,
                        weld: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a dense SDF grid.

    sdf: [R, R, R] (or [R,R,R,1]) float grid. Returns (verts [V,3] in
    [-0.5, 0.5]³ like the reference, faces [F,3] int64). ``weld=False``
    returns an unwelded triangle soup (verts = 3·F rows) — much faster on
    large/noisy surfaces, sufficient for point sampling.
    """
    sdf = np.asarray(sdf, np.float64).squeeze()
    R = sdf.shape[0]
    vol = sdf - level

    # corner values per cube: [C, 8] where C = (R-1)^3
    idx = np.arange(R - 1)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    base = np.stack([gx, gy, gz], -1).reshape(-1, 3)          # [C, 3]
    corner_pos = base[:, None, :] + _CORNERS[None]            # [C, 8, 3]
    vals = vol[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]

    # quick reject: cubes fully in/out
    active = ~((vals > 0).all(1) | (vals < 0).all(1))
    if not active.any():
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    vals = vals[active]
    corner_pos = corner_pos[active].astype(np.float64)

    def orient(tri_batch: np.ndarray, ref_dir: np.ndarray) -> np.ndarray:
        """Flip triangles whose normal opposes ref_dir (the local
        inside→outside direction of the emitting tet), so every face winds
        CCW seen from outside — glTF/OBJ viewers backface-cull otherwise."""
        n = np.cross(tri_batch[:, 1] - tri_batch[:, 0],
                     tri_batch[:, 2] - tri_batch[:, 0])
        flip = np.einsum("fi,fi->f", n, ref_dir) < 0
        tri_batch[flip] = tri_batch[flip][:, [0, 2, 1]]
        return tri_batch

    tris = []
    for tet in _TETS:
        v = vals[:, tet]                                       # [C, 4]
        p = corner_pos[:, tet]                                 # [C, 4, 3]
        inside = v < 0                                         # [C, 4]
        count = inside.sum(1)

        def interp(pa, pb, va, vb):
            t = va / (va - vb + 1e-30)
            return pa + t[:, None] * (pb - pa)

        # one vertex inside → one triangle
        for ci in range(4):
            mask = (count == 1) & inside[:, ci]
            if mask.any():
                others = [k for k in range(4) if k != ci]
                pa, va = p[mask, ci], v[mask, ci]
                e = [interp(pa, p[mask, k], va, v[mask, k]) for k in others]
                t3 = np.stack(e, 1)
                tris.append(orient(t3, t3.mean(1) - pa))   # away from inside
            # three inside (one outside) → one triangle
            mask = (count == 3) & (~inside[:, ci])
            if mask.any():
                others = [k for k in range(4) if k != ci]
                pa, va = p[mask, ci], v[mask, ci]
                e = [interp(p[mask, k], pa, v[mask, k], va) for k in others]
                t3 = np.stack(e, 1)
                tris.append(orient(t3, pa - t3.mean(1)))   # toward outside
        # two inside → quad → two triangles
        import itertools
        for pair in itertools.combinations(range(4), 2):
            inside_pair = np.zeros(4, bool)
            inside_pair[list(pair)] = True
            mask = (count == 2) & (inside[:, pair[0]] & inside[:, pair[1]])
            if not mask.any():
                continue
            out = [k for k in range(4) if k not in pair]
            a, b = pair
            c, d = out
            e_ac = interp(p[mask, a], p[mask, c], v[mask, a], v[mask, c])
            e_ad = interp(p[mask, a], p[mask, d], v[mask, a], v[mask, d])
            e_bc = interp(p[mask, b], p[mask, c], v[mask, b], v[mask, c])
            e_bd = interp(p[mask, b], p[mask, d], v[mask, b], v[mask, d])
            ref = (p[mask, c] + p[mask, d] - p[mask, a] - p[mask, b]) / 2.0
            tris.append(orient(np.stack([e_ac, e_ad, e_bc], 1), ref))
            tris.append(orient(np.stack([e_bc, e_ad, e_bd], 1), ref))

    if not tris:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    tri = np.concatenate(tris, 0)                              # [F, 3, 3]
    verts_flat = tri.reshape(-1, 3)

    if not weld:
        verts = verts_flat / (R - 1) - 0.5
        faces = np.arange(len(verts_flat), dtype=np.int64).reshape(-1, 3)
        return verts, faces

    # weld vertices: pack the (quantized) coordinates into one int64 key —
    # 1-D np.unique is far cheaper than row-wise unique
    q = np.round(verts_flat * 1e4).astype(np.int64)            # ≤20 bits each
    keys = (q[:, 0] << 42) | (q[:, 1] << 21) | q[:, 2]
    _, uniq_idx, inv = np.unique(keys, return_index=True, return_inverse=True)
    verts = verts_flat[uniq_idx]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & \
           (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    # normalize to [-0.5, 0.5] like the reference (util_3d.py:220-224)
    verts = verts / (R - 1) - 0.5
    return verts, faces


def sample_surface_points(verts: np.ndarray, faces: np.ndarray, n: int,
                          rng: np.random.RandomState) -> np.ndarray:
    """Area-weighted barycentric sampling of n points on a triangle mesh."""
    if len(faces) == 0:
        return np.zeros((n, 3), np.float32)
    tri = verts[faces]                                         # [F, 3, 3]
    a = tri[:, 1] - tri[:, 0]
    b = tri[:, 2] - tri[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    probs = areas / max(areas.sum(), 1e-12)
    pick = rng.choice(len(faces), size=n, p=probs)
    u = rng.rand(n, 1)
    v = rng.rand(n, 1)
    flip = (u + v) > 1
    u[flip] = 1 - u[flip]
    v[flip] = 1 - v[flip]
    pts = tri[pick, 0] + u * a[pick] + v * b[pick]
    return pts.astype(np.float32)


def normalize_point_cloud(pts: np.ndarray, mode: str | None) -> np.ndarray:
    """The reference's per-metric point-cloud normalization conventions.

    - ``"bbox_axis"``: center each axis on its bbox midpoint, then divide
      by the per-axis max — every axis spans exactly [-1, 1], anisotropic
      (the diversity metric's ``normalize``, eval_3dfront.py:783-796).
    - ``"mean_maxabs"``: subtract the point mean, divide by the global
      max |coord| — isotropic, inside [-1, 1] (the MMD driver's
      ``normalization``, compute_mmd_cov_1nn.py:395-401).
    - ``None``/``"none"``: unchanged (the consistency chamfer compares raw
      canonical-frame vertices, consistency_check.py:68-79).
    """
    if mode in (None, "none") or len(pts) == 0:
        return pts
    pts = np.asarray(pts, np.float32).copy()
    if mode == "bbox_axis":
        lo, hi = pts.min(0), pts.max(0)
        pts -= lo + (hi - lo) * 0.5
        # the reference divides by the raw per-axis max (zero for a flat
        # axis → inf); guard the degenerate axis instead of propagating nan
        return pts / np.maximum(pts.max(0), 1e-9)
    if mode == "mean_maxabs":
        pts -= pts.mean(0)
        return pts / max(np.abs(pts).max(), 1e-9)
    raise ValueError(f"unknown normalization mode: {mode!r}")


def resample_rows(pts: np.ndarray, n: int,
                  rng: np.random.RandomState) -> np.ndarray:
    """The reference's vertex-resampling rule (helpers/util.py:31-44
    ``sample_points`` / compute_mmd_cov_1nn.py:372-386 ``sample_pc``):
    a random permutation prefix when enough rows exist, sampling with
    replacement otherwise."""
    if len(pts) == 0:
        return np.zeros((n, 3), np.float32)
    if len(pts) >= n:
        return pts[rng.permutation(len(pts))[:n]]
    return pts[rng.randint(0, len(pts), size=n)]


def sdf_to_vertex_cloud(sdf: np.ndarray, n_points: int = 5000,
                        level: float = 0.02,
                        rng: np.random.RandomState | None = None,
                        normalize: str | None = None) -> np.ndarray:
    """SDF grid → n resampled MESH VERTICES in the canonical [-0.5, 0.5]
    frame — the clouds every reference metric actually consumes: the
    per-object ``object_meshes/*.obj`` are exported BEFORE the box fit
    (helpers/util.py:317 vs :320), and the metric drivers resample their
    vertices, not surface points (compute_mmd_cov_1nn.py:430-447,
    consistency_check.py:68-77, eval_3dfront.py:598-616)."""
    rng = rng or np.random.RandomState(0)
    verts, _ = marching_tetrahedra(sdf, level, weld=True)
    pts = resample_rows(verts.astype(np.float32), n_points, rng)
    return normalize_point_cloud(pts, normalize)


def sdf_to_point_cloud(sdf: np.ndarray, n_points: int = 5000,
                       level: float = 0.02,
                       rng: np.random.RandomState | None = None,
                       normalize: bool | str | None = True) -> np.ndarray:
    """SDF grid → n area-weighted surface points (a lower-variance
    alternative to the reference's vertex resampling; see
    ``sdf_to_vertex_cloud`` for the protocol-exact clouds). Uses the
    weld-free triangle soup — sampling doesn't need shared vertices.

    ``normalize=True`` keeps this helper's historical [-0.5, 0.5]
    bbox-isotropic scaling; a string selects a reference convention from
    ``normalize_point_cloud``."""
    rng = rng or np.random.RandomState(0)
    verts, faces = marching_tetrahedra(sdf, level, weld=False)
    pts = sample_surface_points(verts, faces, n_points, rng)
    if isinstance(normalize, str):
        return normalize_point_cloud(pts, normalize)
    if normalize and len(pts):
        center = (pts.max(0) + pts.min(0)) / 2
        pts = pts - center
        scale = np.abs(pts).max() + 1e-9
        pts = pts / (2 * scale)
    return pts
