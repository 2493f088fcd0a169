"""Tests for scene assembly, OBJ/PNG export, top-down render, FID/KID."""

import os

import numpy as np

from commonscenes_tpu.data.synthetic import box_sdf
from commonscenes_tpu.eval.fid import (compute_fid_kid, fid_from_features,
                                       kid_from_features,
                                       random_patch_features)
from commonscenes_tpu.eval.scene_export import (export_obj,
                                                fit_vertices_to_box,
                                                render_topdown, save_png,
                                                yaw_rotation)
from commonscenes_tpu.ops.mesh import marching_tetrahedra


def unit_cube():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float64)
    return v


def _reference_fit(verts, box, angle_deg):
    """Numpy mirror of fit_shapes_to_box_v2 (util.py:158-189) with trimesh
    semantics spelled out: apply_transform(T@R) = rotate then translate,
    apply_scale = about the origin, bounds from the vertex extrema."""
    v = np.asarray(verts, np.float64)
    lo, hi = v.min(0), v.max(0)
    bottom_center = lo + (hi - lo) / 2.0
    bottom_center[1] = lo[1]
    th = -np.pi / 2                      # trimesh rotation_matrix(-pi/2, y)
    Rt = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    v = (Rt @ v.T).T - bottom_center
    shape_size = v.max(0) - v.min(0)
    v = v / shape_size * np.array(box[:3])
    R = yaw_rotation(angle_deg)
    return (np.linalg.inv(R) @ v.T).T + np.asarray(box[3:6])


def test_fit_matches_reference_pipeline():
    rng = np.random.RandomState(0)
    v = rng.rand(50, 3) * [0.4, 0.8, 0.6] + [0.1, -0.3, 0.2]  # off-center
    box = np.array([2.0, 1.0, 3.0, 5.0, 0.5, -4.0])
    for ang in (0.0, 37.0, -120.0):
        ours = fit_vertices_to_box(v, box, angle_deg=ang)
        theirs = _reference_fit(v, box, ang)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_fit_centered_mesh_lands_in_box():
    """SDF-decoded meshes are xz-centered, so the reference's pre-rotation
    bottom-center quirk vanishes: the placed mesh fills the box at t."""
    v = unit_cube() - [0.5, 0.5, 0.5]
    box = np.array([2.0, 1.0, 3.0, 5.0, 0.5, -4.0])
    out = fit_vertices_to_box(v, box, angle_deg=0.0)
    ext = out.max(0) - out.min(0)
    np.testing.assert_allclose(sorted(ext), sorted([2.0, 1.0, 3.0]), atol=1e-6)
    center = (out.max(0) + out.min(0)) / 2
    np.testing.assert_allclose(center[[0, 2]], [5.0, -4.0], atol=1e-6)
    np.testing.assert_allclose(out.min(0)[1], 0.5, atol=1e-6)


def test_yaw_rotation_90():
    R = yaw_rotation(90.0)
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 0, 1], atol=1e-12)


def test_obj_and_png_export(tmp_path):
    sdf = box_sdf(16, (0.5, 0.5, 0.5), trunc=1.0)
    verts, faces = marching_tetrahedra(sdf, level=0.0)
    p = str(tmp_path / "scene.obj")
    export_obj(p, [(verts, faces)], names=["cube"])
    text = open(p).read()
    assert text.count("v ") >= len(verts)
    assert "o cube" in text

    img = render_topdown([(verts, faces)], classes=[1], resolution=64,
                         extent=2.0)
    assert img.shape == (64, 64, 3)
    # the cube covers the center, background stays white at corners
    assert img[0, 0, 0] == 1.0
    assert img[32, 32, 0] != 1.0

    png = str(tmp_path / "img.png")
    save_png(png, img)
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_fid_zero_for_identical_sets(rng):
    feats = rng.randn(64, 32).astype(np.float64)
    assert fid_from_features(feats, feats.copy()) < 1e-6
    far = feats + 100.0
    assert fid_from_features(feats, far) > 100.0


def test_kid_ordering(rng):
    a = rng.randn(100, 16)
    b = rng.randn(100, 16)
    c = rng.randn(100, 16) + 3.0
    near = kid_from_features(a, b, n_subsets=5, subset_size=50)
    farv = kid_from_features(a, c, n_subsets=5, subset_size=50)
    assert farv > near


def test_compute_fid_kid_on_renders(rng):
    imgs_a = rng.rand(8, 256, 256, 3).astype(np.float32)
    imgs_b = np.clip(imgs_a + 0.5, 0, 1)
    res_same = compute_fid_kid(imgs_a, imgs_a, extractor=random_patch_features)
    res_diff = compute_fid_kid(imgs_a, imgs_b, extractor=random_patch_features)
    assert res_same["fid"] < 1e-5
    assert res_diff["fid"] > res_same["fid"]


def test_glb_export_structurally_valid(tmp_path):
    """export_glb writes a parseable binary glTF 2.0 container whose
    accessors round-trip the input geometry (the reference exports every
    eval scene as .glb, helpers/visualize_scene.py:256,359,443)."""
    import json
    import struct

    from commonscenes_tpu.eval.scene_export import export_glb

    sdf = box_sdf(16, (0.5, 0.5, 0.5), trunc=1.0)
    verts, faces = marching_tetrahedra(sdf, level=0.0)
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tfaces = np.array([[0, 1, 2]], np.int64)
    p = str(tmp_path / "scene.glb")
    export_glb(p, [(verts, faces), (tri, tfaces)], names=["cube", "tri"],
               colors=[[0.8, 0.2, 0.2], [0.2, 0.8, 0.2]])

    raw = open(p, "rb").read()
    magic, version, total = struct.unpack("<III", raw[:12])
    assert magic == 0x46546C67 and version == 2 and total == len(raw)
    jlen, jtype = struct.unpack("<II", raw[12:20])
    assert jtype == 0x4E4F534A and jlen % 4 == 0
    doc = json.loads(raw[20:20 + jlen])
    blen, btype = struct.unpack("<II", raw[20 + jlen:28 + jlen])
    assert btype == 0x004E4942
    payload = raw[28 + jlen:28 + jlen + blen]
    assert doc["buffers"][0]["byteLength"] <= blen

    assert len(doc["meshes"]) == 2 and len(doc["nodes"]) == 2
    assert doc["nodes"][0]["name"] == "cube"
    assert len(doc["materials"]) == 2
    np.testing.assert_allclose(
        doc["materials"][1]["pbrMetallicRoughness"]["baseColorFactor"],
        [0.2, 0.8, 0.2, 1.0])

    # round-trip the second (tiny) mesh through its accessors/bufferViews
    mesh1 = doc["meshes"][1]["primitives"][0]
    acc_p = doc["accessors"][mesh1["attributes"]["POSITION"]]
    acc_i = doc["accessors"][mesh1["indices"]]
    assert acc_p["count"] == 3 and acc_i["count"] == 3
    bv = doc["bufferViews"][acc_p["bufferView"]]
    assert bv["byteOffset"] % 4 == 0
    got = np.frombuffer(
        payload[bv["byteOffset"]:bv["byteOffset"] + bv["byteLength"]],
        np.float32).reshape(3, 3)
    np.testing.assert_allclose(got, tri)
    bvi = doc["bufferViews"][acc_i["bufferView"]]
    got_i = np.frombuffer(
        payload[bvi["byteOffset"]:bvi["byteOffset"] + bvi["byteLength"]],
        np.uint32)
    np.testing.assert_array_equal(got_i, [0, 1, 2])
    np.testing.assert_allclose(acc_p["min"], [0, 0, 0])
    np.testing.assert_allclose(acc_p["max"], [1, 1, 0])

    # first mesh: accessor counts match the marching-tetrahedra geometry
    mesh0 = doc["meshes"][0]["primitives"][0]
    assert doc["accessors"][mesh0["attributes"]["POSITION"]]["count"] \
        == len(verts)
    assert doc["accessors"][mesh0["indices"]]["count"] == faces.size

    # degenerate/empty meshes are skipped, not written
    p2 = str(tmp_path / "empty.glb")
    export_glb(p2, [(np.zeros((0, 3), np.float32),
                     np.zeros((0, 3), np.int64)), (tri, tfaces)])
    doc2 = json.loads(open(p2, "rb").read()[20:][:struct.unpack(
        "<I", open(p2, "rb").read()[12:16])[0]])
    assert len(doc2["meshes"]) == 1


def test_angle_bin_decode_reference_convention():
    """Pin the reference decode (eval_3dfront.py:516):
    -180 + (bin+1)*15 for 24 bins."""
    from commonscenes_tpu.eval.scene_export import angle_bin_to_degrees
    assert angle_bin_to_degrees(0) == -165.0
    assert angle_bin_to_degrees(11) == 0.0
    assert angle_bin_to_degrees(23) == 180.0
    assert angle_bin_to_degrees(99) == 180.0   # clamped


def test_compute_fid_room_filter_never_silently_unfiltered(tmp_path):
    from commonscenes_tpu.cli.compute_fid import load_dir
    from commonscenes_tpu.eval.scene_export import save_png
    import pytest
    for n in ("a-1", "a-2"):
        save_png(str(tmp_path / f"{n}.png"),
                 np.zeros((8, 8, 3), np.float32))
    with pytest.raises(SystemExit, match="matched 0"):
        load_dir(str(tmp_path), room_type="bedroom")


def test_pseudo_clip_process_stable():
    """sha1-seeded pseudo-CLIP features must be identical across processes
    (hash() is salted per process and would scramble eval conditioning)."""
    import subprocess
    import sys
    code = ("from commonscenes_tpu.data.synthetic import _pseudo_clip;"
            "print(float(_pseudo_clip('a red chair', 16)[0]))")
    vals = set()
    for seed in ("1", "2"):
        out = subprocess.run(
            [sys.executable, "-c", code],
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))},
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-500:]
        vals.add(out.stdout.strip())
    assert len(vals) == 1, f"per-process feature drift: {vals}"


def test_fid_closed_form_diagonal():
    """Analytic Fréchet distance for diagonal Gaussians:
    |mu1-mu2|^2 + sum(s1 + s2 - 2*sqrt(s1*s2))."""
    from commonscenes_tpu.eval.fid import frechet_distance
    mu1, mu2 = np.zeros(2), np.array([1.0, 2.0])
    s1, s2 = np.diag([4.0, 9.0]), np.diag([1.0, 1.0])
    expected = 5.0 + (4 + 1 - 2 * 2.0) + (9 + 1 - 2 * 3.0)
    np.testing.assert_allclose(frechet_distance(mu1, s1, mu2, s2), expected,
                               rtol=1e-9)


def test_box_outline_mesh_geometry(tmp_path):
    """Cylinder-edge bbox outlines (reference helpers/visualize_scene.py:196
    via render/lineMesh.py): 12 cylinders whose vertices sit exactly at
    `radius` from their edge segment, corners per params_to_8points_3dfront
    (helpers/util.py:379-392)."""
    from commonscenes_tpu.eval.scene_export import (BOX_EDGES,
                                                    box_corners_3dfront,
                                                    box_outline_mesh)
    box7 = np.array([2.0, 1.0, 1.5, 0.3, 0.0, -0.4, 30.0])
    corners = box_corners_3dfront(box7, degrees=True)
    # reference formula re-derived by hand: bottom-anchored y in [0, h],
    # corners right-multiplied by the yaw rotation then translated
    l, h, w = box7[:3]
    base = np.array([[i * l / 2, j * h, k * w / 2]
                     for i in (-1, 1) for j in (0, 1) for k in (-1, 1)])
    y = np.deg2rad(30.0)
    R = np.array([[np.cos(y), 0, -np.sin(y)], [0, 1, 0],
                  [np.sin(y), 0, np.cos(y)]])
    np.testing.assert_allclose(corners, base @ R + box7[3:6], atol=1e-12)

    radius, sections = 0.02, 8
    verts, faces = box_outline_mesh(box7, radius=radius, sections=sections)
    assert verts.shape == (12 * 2 * sections, 3)
    assert faces.shape == (12 * 2 * sections, 3)
    assert faces.max() == len(verts) - 1 and faces.min() == 0
    # every ring vertex lies at exactly `radius` from its edge segment
    for e_idx, (e0, e1) in enumerate(BOX_EDGES):
        seg0, seg1 = corners[e0], corners[e1]
        d = seg1 - seg0
        d = d / np.linalg.norm(d)
        ring = verts[e_idx * 2 * sections:(e_idx + 1) * 2 * sections]
        rel = ring - seg0
        perp = rel - np.outer(rel @ d, d)
        np.testing.assert_allclose(np.linalg.norm(perp, axis=1), radius,
                                   atol=1e-9)

    # OBJ export contains the outline geometry as its own object
    path = str(tmp_path / "outline.obj")
    export_obj(path, [(verts, faces)], ["bbox_0"])
    text = open(path).read()
    assert "o bbox_0" in text
    assert text.count("\nv ") == len(verts)
    assert text.count("\nf ") == len(faces)


def test_solid_box_mesh_geometry():
    """solid_box_mesh: closed 12-face box spanning (l,h,w) at (px,py,pz),
    rotated by yaw — the shared render proxy for GT and predicted sets."""
    from commonscenes_tpu.eval.scene_export import solid_box_mesh
    v, f = solid_box_mesh(np.array([2.0, 1.0, 0.5, 3.0, 0.0, -1.0]))
    assert v.shape == (8, 3) and f.shape == (12, 3)
    # extents: x=w, y=h (bottom-anchored), z=l
    np.testing.assert_allclose(v[:, 0].max() - v[:, 0].min(), 0.5)
    np.testing.assert_allclose(v[:, 1].min(), 0.0)
    np.testing.assert_allclose(v[:, 1].max(), 1.0)
    np.testing.assert_allclose(v[:, 2].max() - v[:, 2].min(), 2.0)
    np.testing.assert_allclose(v.mean(0), [3.0, 0.5, -1.0], atol=1e-9)
    # 90° yaw swaps the footprint axes
    v90, _ = solid_box_mesh(np.array([2.0, 1.0, 0.5, 0, 0, 0]),
                            angle_deg=90.0)
    np.testing.assert_allclose(v90[:, 0].max() - v90[:, 0].min(), 2.0,
                               atol=1e-9)


def test_collect_gt_renders_sdf_out(tmp_path):
    """--sdf_out writes the MMD reference set: per-scan GT SDF npz (real
    slots only) + layouts.json mapping slots to classes."""
    import json
    from commonscenes_tpu.cli.collect_gt_renders import main
    out = str(tmp_path / "r")
    sdf_out = str(tmp_path / "s")
    main(["--dataset", "synthetic", "--out", out, "--num_scenes", "2",
          "--resolution", "32", "--sdf_out", sdf_out])
    files = sorted(os.listdir(sdf_out))
    assert "layouts.json" in files
    npzs = [f for f in files if f.endswith("_sdf.npz")]
    assert len(npzs) == 2
    d = np.load(os.path.join(sdf_out, npzs[0]))
    assert d["sdf"].ndim == 4 and len(d["slots"]) == len(d["sdf"])
    layouts = json.load(open(os.path.join(sdf_out, "layouts.json")))
    assert all("scan_id" in e and "objs" in e for e in layouts)
    # the MMD loader consumes this directory directly
    from commonscenes_tpu.cli.compute_mmd_cov_1nn import load_sdf_dir
    by_class = load_sdf_dir(sdf_out)
    assert sum(len(v) for v in by_class.values()) == sum(
        len(np.load(os.path.join(sdf_out, f))["sdf"]) for f in npzs)
