"""Scene assembly + mesh export + top-down rendering (numpy, host-side).

Capability parity with the reference visualization stack without its
trimesh/pyrender dependencies:
* ``fit_vertices_to_box`` — the vertex transform of
  helpers/util.py:158-189 ``fit_shapes_to_box_v2`` (recentre to bottom
  center, −90° pre-rotation, unit-scale, scale to (l,h,w), yaw rotation,
  translate);
* ``export_obj`` — scene mesh export (replacing the reference's .glb via
  trimesh, visualize_scene.py:378-461);
* ``render_topdown`` — 256×256 orthographic top-down rasterizer with a
  z(y)-buffer and per-class colors, the geometry convention of
  collect_gt_sdf_images.py:55-60 (camera above, y-up) — feeds the FID/KID
  pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def yaw_rotation(y_deg: float, degrees: bool = True) -> np.ndarray:
    """helpers/util.py:510-516 get_rotation_3dfront."""
    y = np.deg2rad(y_deg) if degrees else y_deg
    return np.array([[np.cos(y), 0, -np.sin(y)],
                     [0, 1, 0],
                     [np.sin(y), 0, np.cos(y)]])


def fit_vertices_to_box(verts: np.ndarray, box: np.ndarray,
                        angle_deg: float = 0.0) -> np.ndarray:
    """Place unit-ish shape vertices into a (l,h,w,px,py,pz) box with a yaw
    angle. Mirrors fit_shapes_to_box_v2 on raw vertex arrays."""
    v = np.asarray(verts, np.float64).copy()
    lo, hi = v.min(0), v.max(0)
    bottom_center = (lo + hi) / 2.0
    bottom_center[1] = lo[1]
    # reference chain (fit_shapes_to_box_v2, util.py:169-174): rotate −90°
    # about +y FIRST — in TRIMESH's convention, v → (−z, y, x), the
    # transpose of get_rotation_3dfront's sense — THEN subtract the
    # PRE-rotation bottom center. For xz-asymmetric meshes that leaves an
    # off-axis residual that gets baked in by the scale; it is the
    # reference's own behavior, kept for parity.
    v = v @ np.array([[0.0, 0.0, 1.0],
                      [0.0, 1.0, 0.0],
                      [-1.0, 0.0, 0.0]]) - bottom_center
    # normalize extents → scale to box
    extents = v.max(0) - v.min(0)
    v = v / np.maximum(extents, 1e-9)
    l, h, w = box[0], box[1], box[2]
    v = v * np.array([l, h, w])
    # yaw + translate (R_inv in the reference applies to vertices)
    R = yaw_rotation(angle_deg)
    v = v @ np.linalg.inv(R).T + np.asarray(box[3:6])
    return v


# the reference's 12 box edges over the corner ordering of
# params_to_8points_3dfront (helpers/visualize_scene.py:136, util.py:405)
BOX_EDGES = np.array([[0, 1], [0, 2], [0, 4], [1, 3], [1, 5], [2, 3],
                      [2, 6], [3, 7], [4, 5], [4, 6], [5, 7], [6, 7]])


def box_corners_3dfront(box7: np.ndarray, degrees: bool = True) -> np.ndarray:
    """8 corners of a (l, h, w, px, py, pz, angle) box — the reference's
    params_to_8points_3dfront (helpers/util.py:379-392): y spans [0, h]
    (bottom-anchored), corners right-multiplied by get_rotation_3dfront
    then translated to the box position."""
    l, h, w, px, py, pz, angle = [float(v) for v in box7]
    pts = []
    for i in (-1, 1):
        for j in (0, 1):
            for k in (-1, 1):
                pts.append([l / 2 * i, h * j, w / 2 * k])
    pts = np.asarray(pts, np.float64) @ yaw_rotation(angle, degrees)
    return pts + np.array([px, py, pz])


def cylinder_between(p0: np.ndarray, p1: np.ndarray, radius: float = 0.02,
                     sections: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulated open cylinder from p0 to p1 (the reference draws box
    outlines as one cylinder per edge: render/lineMesh.py LineMesh,
    helpers/visualize_scene.py:196, radius 0.02)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    if length < 1e-12:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    axis = axis / length
    # orthonormal frame around the axis
    ref = np.array([1.0, 0.0, 0.0])
    if abs(axis @ ref) > 0.9:
        ref = np.array([0.0, 1.0, 0.0])
    u = np.cross(axis, ref)
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    ang = np.linspace(0, 2 * np.pi, sections, endpoint=False)
    ring = (np.outer(np.cos(ang), u) + np.outer(np.sin(ang), v)) * radius
    verts = np.concatenate([ring + p0, ring + p1], 0)
    faces = []
    for s in range(sections):
        t = (s + 1) % sections
        faces.append([s, t, s + sections])
        faces.append([t, t + sections, s + sections])
    return verts, np.asarray(faces, np.int64)


def solid_box_mesh(box, angle_deg: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Solid box triangle mesh from (l, h, w, px, py, pz), yawed by
    angle_deg — box proxies must carry the same rotation real meshes get,
    or FID measures a rotation-distribution gap instead of quality
    (reference render_boxes geometry, helpers/visualize_scene.py:193-199)."""
    l, h, w, px, py, pz = [float(v) for v in box[:6]]
    xs = np.array([-w / 2, w / 2])
    ys = np.array([0.0, h])
    zs = np.array([-l / 2, l / 2])
    verts = np.array([[x, y, z] for x in xs for y in ys for z in zs])
    if angle_deg:
        verts = verts @ yaw_rotation(angle_deg).T
    verts += np.array([px, py, pz])
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return verts, faces


def box_outline_mesh(box7: np.ndarray, degrees: bool = True,
                     radius: float = 0.02, sections: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """One merged triangle mesh tracing the 12 edges of a param7 box with
    cylinders — the reference's bbox outline geometry
    (helpers/visualize_scene.py:193-199 via render/lineMesh.py)."""
    corners = box_corners_3dfront(box7, degrees)
    verts_all, faces_all = [], []
    off = 0
    for e0, e1 in BOX_EDGES:
        vv, ff = cylinder_between(corners[e0], corners[e1],
                                  radius=radius, sections=sections)
        if len(vv) == 0:
            continue
        verts_all.append(vv)
        faces_all.append(ff + off)
        off += len(vv)
    if not verts_all:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    return np.concatenate(verts_all, 0), np.concatenate(faces_all, 0)


def angle_bin_to_degrees(bin_idx: int, num_bins: int = 24) -> float:
    """Reference decode convention (scripts/eval_3dfront.py:516):
    ``-180 + (bin + 1) * (360 / num_bins)`` — every rendered/exported yaw
    uses exactly the reference's mapping (its encode digitizes over
    linspace(-180, 180, 24) while the decode assumes 15° bins; that
    asymmetry is the reference's, kept for parity)."""
    return float(-180.0 + (min(bin_idx, num_bins - 1) + 1)
                 * (360.0 / num_bins))


def export_obj(path: str, meshes: Sequence[Tuple[np.ndarray, np.ndarray]],
               names: Optional[Sequence[str]] = None) -> None:
    """Write a multi-object OBJ file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        offset = 1
        for k, (verts, faces) in enumerate(meshes):
            name = names[k] if names else f"obj_{k}"
            f.write(f"o {name}\n")
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            for face in faces:
                f.write(f"f {face[0]+offset} {face[1]+offset} {face[2]+offset}\n")
            offset += len(verts)


def export_glb(path: str, meshes: Sequence[Tuple[np.ndarray, np.ndarray]],
               names: Optional[Sequence[str]] = None,
               colors: Optional[Sequence[Sequence[float]]] = None) -> None:
    """Write a binary glTF 2.0 (.glb) scene: one node per object mesh with
    an optional per-object baseColor material.

    The reference exports every evaluated scene as
    ``{scene_id}_{render_type}.glb`` via trimesh
    (helpers/visualize_scene.py:256,359,443); this writer produces the same
    artifact without the trimesh/pyrender dependency stack — plain glTF
    JSON + packed binary buffers (positions fp32 VEC3, indices uint32).
    """
    import json as _json
    import struct

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    bin_parts: list = []
    buffer_views = []
    accessors = []
    gltf_meshes = []
    nodes = []
    materials = []
    offset = 0

    def _pad4(b: bytes, fill: bytes = b"\x00") -> bytes:
        return b + fill * (-len(b) % 4)

    for k, (verts, faces) in enumerate(meshes):
        v = np.ascontiguousarray(np.asarray(verts, np.float32))
        f = np.ascontiguousarray(np.asarray(faces, np.uint32))
        if v.size == 0 or f.size == 0:
            continue
        vb = _pad4(v.tobytes())
        ib = _pad4(f.tobytes())
        buffer_views.append({"buffer": 0, "byteOffset": offset,
                             "byteLength": v.nbytes, "target": 34962})
        offset += len(vb)
        buffer_views.append({"buffer": 0, "byteOffset": offset,
                             "byteLength": f.nbytes, "target": 34963})
        offset += len(ib)
        bin_parts += [vb, ib]
        acc_pos = len(accessors)
        accessors.append({"bufferView": len(buffer_views) - 2,
                          "componentType": 5126, "count": int(v.shape[0]),
                          "type": "VEC3",
                          "min": [float(x) for x in v.min(0)],
                          "max": [float(x) for x in v.max(0)]})
        accessors.append({"bufferView": len(buffer_views) - 1,
                          "componentType": 5125, "count": int(f.size),
                          "type": "SCALAR"})
        prim = {"attributes": {"POSITION": acc_pos}, "indices": acc_pos + 1}
        if colors is not None:
            rgb = [float(c) for c in colors[k]][:3]
            prim["material"] = len(materials)
            materials.append({
                "name": (names[k] if names else f"obj_{k}"),
                "pbrMetallicRoughness": {
                    "baseColorFactor": rgb + [1.0],
                    "metallicFactor": 0.0, "roughnessFactor": 0.9}})
        gltf_meshes.append({"primitives": [prim]})
        nodes.append({"mesh": len(gltf_meshes) - 1,
                      "name": (names[k] if names else f"obj_{k}")})

    doc = {"asset": {"version": "2.0", "generator": "commonscenes_tpu"},
           "scene": 0,
           "scenes": [{"nodes": list(range(len(nodes)))}],
           "nodes": nodes, "meshes": gltf_meshes,
           "accessors": accessors, "bufferViews": buffer_views,
           "buffers": [{"byteLength": offset}]}
    if materials:
        doc["materials"] = materials

    json_bytes = _pad4(_json.dumps(doc, separators=(",", ":")).encode(),
                       b" ")
    bin_bytes = b"".join(bin_parts)
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_bytes)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<III", 0x46546C67, 2, total))   # glTF v2
        fh.write(struct.pack("<II", len(json_bytes), 0x4E4F534A))  # JSON
        fh.write(json_bytes)
        fh.write(struct.pack("<II", len(bin_bytes), 0x004E4942))   # BIN
        fh.write(bin_bytes)


DEFAULT_PALETTE = np.array([
    [0.9, 0.9, 0.9], [0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.2, 0.2, 0.8],
    [0.8, 0.8, 0.2], [0.8, 0.2, 0.8], [0.2, 0.8, 0.8], [0.5, 0.3, 0.1],
    [0.9, 0.5, 0.1], [0.4, 0.6, 0.3], [0.6, 0.4, 0.7], [0.3, 0.3, 0.3],
])


def render_topdown(meshes: Sequence[Tuple[np.ndarray, np.ndarray]],
                   classes: Sequence[int], resolution: int = 256,
                   extent: float = 8.0, max_faces: int = 60000) -> np.ndarray:
    """Orthographic top-down render: world (x, z) → image plane, height (y)
    as the depth buffer. Returns [res, res, 3] float image in [0, 1].
    Meshes above ``max_faces`` are area-weighted subsampled (raw generated
    SDFs can triangulate into millions of sliver faces)."""
    img = np.ones((resolution, resolution, 3), np.float64)
    zbuf = np.full((resolution, resolution), -np.inf)

    half = extent / 2.0
    scale = resolution / extent

    for mesh_i, (verts, faces) in enumerate(meshes):
        if len(faces) == 0:
            continue
        color = DEFAULT_PALETTE[classes[mesh_i] % len(DEFAULT_PALETTE)]
        if len(faces) > max_faces:
            tri_all = verts[faces]
            a = tri_all[:, 1] - tri_all[:, 0]
            b = tri_all[:, 2] - tri_all[:, 0]
            areas = 0.5 * np.linalg.norm(np.cross(a, b), axis=1) + 1e-12
            pick = np.random.RandomState(0).choice(
                len(faces), size=max_faces, replace=False,
                p=areas / areas.sum())
            faces = faces[pick]
        tri = verts[faces]                          # [F, 3, 3]
        # screen coords
        sx = (tri[..., 0] + half) * scale
        sy = (tri[..., 2] + half) * scale
        height = tri[..., 1].mean(1)                # per-face height

        for fi in range(len(tri)):
            xs, ys = sx[fi], sy[fi]
            x0, x1 = int(max(np.floor(xs.min()), 0)), int(min(np.ceil(xs.max()), resolution - 1))
            y0, y1 = int(max(np.floor(ys.min()), 0)), int(min(np.ceil(ys.max()), resolution - 1))
            if x1 < x0 or y1 < y0:
                continue
            # edge-function fill (sign-agnostic: accepts both windings)
            gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1),
                                 indexing="ij")
            px, py = gx + 0.5, gy + 0.5

            def edge(ax, ay, bx, by):
                return (px - ax) * (by - ay) - (py - ay) * (bx - ax)

            e0 = edge(xs[0], ys[0], xs[1], ys[1])
            e1 = edge(xs[1], ys[1], xs[2], ys[2])
            e2 = edge(xs[2], ys[2], xs[0], ys[0])
            inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                     ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            if not inside.any():
                continue
            hsel = height[fi]
            ix, iy = gx[inside], gy[inside]
            upd = hsel > zbuf[ix, iy]
            ix, iy = ix[upd], iy[upd]
            zbuf[ix, iy] = hsel
            # simple height shading
            shade = 0.6 + 0.4 * np.tanh(hsel / 2.0)
            img[ix, iy] = color * shade
    return img.astype(np.float32)


def load_png(path: str) -> np.ndarray:
    """Minimal PNG reader for the RGB8 non-interlaced files save_png writes
    (supports filter types 0–4). Returns float [H, W, 3] in [0, 1]."""
    import struct
    import zlib
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", chunk[:10])
            assert depth == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    o = 0
    for row in range(h):
        ftype = raw[o]
        line = np.frombuffer(raw[o + 1:o + 1 + stride], np.uint8).astype(np.int32)
        o += 1 + stride
        cur = np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:   # up
            cur = (line + prev) & 0xFF
        else:              # sub / average / paeth need sequential scan
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        out[row] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 3).astype(np.float32) / 255.0


def save_png(path: str, img: np.ndarray) -> None:
    """Minimal PNG writer (no PIL dependency)."""
    import struct
    import zlib
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(png)
