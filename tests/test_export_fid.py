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


def test_fit_vertices_extents_and_position():
    v = unit_cube()
    box = np.array([2.0, 1.0, 3.0, 5.0, 0.5, -4.0])
    out = fit_vertices_to_box(v, box, angle_deg=0.0)
    ext = out.max(0) - out.min(0)
    # extents follow (l → z?, w → x?) after the −90° pre-rotation: check
    # the sorted extents match the box dims
    np.testing.assert_allclose(sorted(ext), sorted([2.0, 1.0, 3.0]), atol=1e-6)
    # bottom center lands at the box translation (y at bottom)
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
