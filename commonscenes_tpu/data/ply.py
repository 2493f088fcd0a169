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
