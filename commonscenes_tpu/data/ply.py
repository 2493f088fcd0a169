"""ASCII/binary PLY point-cloud I/O.

Capability parity with reference dataset/util.py:5-109 (read_ply/write_ply
used by the retrieval helpers) — numpy-only, supports xyz (+rgb) ASCII and
binary_little_endian vertices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None, ascii_fmt: bool = True
              ) -> None:
    points = np.asarray(points, np.float32)
    n = len(points)
    header = ["ply",
              "format ascii 1.0" if ascii_fmt else
              "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.clip(np.asarray(colors) * 255 if colors.dtype.kind == "f"
                         else colors, 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")

    if ascii_fmt:
        with open(path, "w") as f:
            f.write("\n".join(header) + "\n")
            for i in range(n):
                row = f"{points[i,0]} {points[i,1]} {points[i,2]}"
                if colors is not None:
                    row += f" {colors[i,0]} {colors[i,1]} {colors[i,2]}"
                f.write(row + "\n")
    else:
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            if colors is None:
                f.write(points.astype("<f4").tobytes())
            else:
                rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
                rec["xyz"] = points
                rec["rgb"] = colors
                f.write(rec.tobytes())


# PLY scalar property types → numpy dtypes (little-endian on disk)
_PLY_TYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "ushort": "<u2", "uint16": "<u2", "short": "<i2", "int16": "<i2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
}

# per-vertex instance-label property names, in the reference's priority
# order (dataset/util.py:46-61: objectId, then label, then mask)
_LABEL_PROPS = ("objectId", "label", "mask")


def read_ply_labeled(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read a PLY with arbitrary per-vertex scalar properties.

    Returns ``(points [N,3] f32, labels [N] i32 or None)`` where labels
    come from the first present ``objectId``/``label``/``mask`` vertex
    property — the annotated-3RScan convention the reference reads via
    plyfile (dataset/util.py:33-65). Supports ascii and
    binary_little_endian; vertex element must precede any face element
    (true for all 3RScan exports).
    """
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]

        # vertex element's own property list (stop at the next element)
        props = []
        in_vertex = False
        n = 0
        for line in header:
            toks = line.split()
            if toks[0] == "element":
                in_vertex = toks[1] == "vertex"
                if in_vertex:
                    n = int(toks[2])
            elif in_vertex and toks[0] == "property":
                if toks[1] == "list":
                    raise ValueError("list property on vertex element")
                props.append((toks[2], _PLY_TYPES[toks[1]]))

        names = [p[0] for p in props]
        label_name = next((p for p in _LABEL_PROPS if p in names), None)
        if fmt == "ascii":
            data = np.atleast_2d(np.loadtxt(f, max_rows=n))
            cols = {nm: data[:, i] for i, (nm, _) in enumerate(props)}
        else:
            rec_dtype = np.dtype(props)
            rec = np.frombuffer(f.read(n * rec_dtype.itemsize),
                                dtype=rec_dtype, count=n)
            cols = {nm: rec[nm] for nm in names}

    pts = np.stack([cols["x"], cols["y"], cols["z"]], 1).astype(np.float32)
    labels = (cols[label_name].astype(np.int32)
              if label_name is not None else None)
    return pts, labels


def write_ply_labeled(path: str, points: np.ndarray,
                      labels: np.ndarray, ascii_fmt: bool = False) -> None:
    """Write points with a per-vertex ``ushort objectId`` property
    (the annotated-3RScan layout; test-fixture side of
    :func:`read_ply_labeled`)."""
    points = np.asarray(points, np.float32)
    labels = np.asarray(labels)
    n = len(points)
    header = ["ply",
              "format ascii 1.0" if ascii_fmt else
              "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z",
              "property ushort objectId", "end_header"]
    if ascii_fmt:
        with open(path, "w") as f:
            f.write("\n".join(header) + "\n")
            for i in range(n):
                f.write(f"{points[i,0]} {points[i,1]} {points[i,2]} "
                        f"{int(labels[i])}\n")
    else:
        rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("objectId", "<u2")])
        rec["xyz"] = points
        rec["objectId"] = labels
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(rec.tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        n = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
        props = [l.split()[-1] for l in header if l.startswith("property")]
        has_rgb = "red" in props

        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
            data = np.atleast_2d(data)
            pts = data[:, :3].astype(np.float32)
            rgb = data[:, 3:6].astype(np.uint8) if has_rgb else None
        else:
            if has_rgb:
                rec = np.frombuffer(
                    f.read(n * 15),
                    dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)], count=n)
                pts, rgb = rec["xyz"].copy(), rec["rgb"].copy()
            else:
                pts = np.frombuffer(f.read(n * 12), dtype="<f4",
                                    count=n * 3).reshape(n, 3).copy()
                rgb = None
    return pts, rgb
