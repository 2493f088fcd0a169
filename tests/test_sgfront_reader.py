"""SG-FRONT reader test against a synthetic on-disk dataset in the published
format (SG-FRONT.md), plus the 3RScan legacy reader."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def sgfront_root(tmp_path):
    root = tmp_path / "sgfront"
    root.mkdir()
    (root / "classes_bedroom.txt").write_text(
        "double_bed\nnightstand\nfloor\npendant_lamp\n")
    (root / "relationships.txt").write_text(
        "left\nright\nfront\nbehind\nclose by\nabove\nstanding on\n"
        "bigger than\nsmaller than\ntaller than\nshorter than\n"
        "symmetrical to\nsame style as\nsame super category as\n"
        "same material as\n")
    (root / "mapping.json").write_text(json.dumps({
        "double_bed": "bed", "nightstand": "nightstand", "floor": "floor",
        "pendant_lamp": "lamp", "_scene_": "_scene_"}))
    rels = {"scans": [{
        "scan": "MasterBedroom-1",
        "objects": {"1": "double_bed", "2": "nightstand", "3": "floor"},
        "relationships": [
            [1, 2, 1, "left"],
            [2, 1, 10, "taller than"],
            [1, 3, 7, "standing on"],
        ],
    }]}
    (root / "relationships_bedroom_trainval.json").write_text(json.dumps(rels))
    boxes = {"MasterBedroom-1": {
        "scene_center": [1.0, 0.0, 1.0],
        "1": {"param7": [2.0, 1.0, 1.5, 1.0, 0.0, 1.0, 0.5],
              "model_path": None, "scale": 1.0},
        "2": {"param7": [0.5, 0.6, 0.5, 2.0, 0.0, 1.0, 0.0],
              "model_path": None, "scale": 1.0},
        "3": {"param7": [4.0, 0.1, 4.0, 1.0, 0.0, 1.0, 0.0],
              "model_path": None, "scale": 1.0},
    }}
    (root / "obj_boxes_bedroom_trainval.json").write_text(json.dumps(boxes))
    stats = np.stack([np.zeros(7), np.ones(7)])
    np.savetxt(root / "boxes_centered_stats_bedroom_trainval.txt", stats)
    return str(root)


def test_sgfront_reader(sgfront_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(sgfront_root, split="train", room_type="bedroom",
                        shuffle_objs=False, with_clip=False)
    assert len(ds) == 1
    v = ds.vocab
    assert "_scene_" in v.obj_classes
    assert v.scene_class_id == 0   # sorts first, reference class-0 semantics
    scene = ds[0]
    assert scene.num_objs == 4     # 3 objects + _scene_ root
    assert scene.triples.shape[1] == 3
    # predicate ids preserved: 'left' == 1 in our PREDICATES ordering
    preds = set(scene.triples[:, 1].tolist())
    assert 1 in preds and 10 in preds and 7 in preds
    # boxes: center shifted by scene_center, stats identity → ×3 scale
    bed_slot = int(np.where(scene.objs == v.class_to_idx["bed"])[0][0])
    np.testing.assert_allclose(scene.boxes[bed_slot],
                               3 * np.array([2.0, 1.0, 1.5, 0.0, 0.0, 0.0]),
                               atol=1e-5)
    # angle binning: 0.5 rad → digitize over 24 bins
    bins = np.linspace(np.deg2rad(-180), np.deg2rad(180), 24)
    expect = np.clip(np.digitize(0.5, bins) - 1, 0, 23)
    assert scene.angles[bed_slot] == expect


def test_sgfront_with_scene_root(sgfront_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(sgfront_root, split="train", room_type="bedroom",
                        shuffle_objs=False, with_clip=False)
    # the vocab must ALWAYS carry the root class (Vocab.from_sgfront adds
    # '_scene_' unconditionally) — guard-as-if made this test vacuous
    assert "_scene_" in ds.vocab.class_to_idx
    scene = ds[0]
    assert (scene.objs == ds.vocab.scene_class_id).sum() == 1
    assert (scene.triples[:, 1] == 0).sum() == 3  # 'in' edges


def test_rscan_reader(tmp_path):
    root = tmp_path / "rscan"
    root.mkdir()
    (root / "classes.txt").write_text("chair\ntable\nwall\n")
    (root / "relationships.txt").write_text("left\nright\nstanding on\n")
    (root / "relationships_train.json").write_text(json.dumps({"scans": [{
        "scan": "scan-0",
        "objects": {"1": "chair", "2": "table"},
        "relationships": [[1, 2, 1, "left"]],
    }]}))
    from commonscenes_tpu.data.rscan import RScanDataset
    ds = RScanDataset(str(root), split="train")
    assert len(ds) == 1
    scene = ds[0]
    assert scene.num_objs == 3  # 2 objects + scene root
    assert (scene.triples[:, 1] == 0).sum() == 2


def test_rscan_reference_filenames(tmp_path):
    """Reference 3RScan conventions (dataset/dataset.py:95-106):
    relationships_merged_{split}_clean.json, obj_boxes_{train}_refined.json,
    and the {split}.txt scan list."""
    root = tmp_path / "rscan_ref"
    root.mkdir()
    (root / "classes.txt").write_text("chair\ntable\nwall\n")
    (root / "relationships.txt").write_text("left\nright\nstanding on\n")
    (root / "relationships_merged_train_clean.json").write_text(json.dumps({
        "scans": [
            {"scan": "scan-a", "objects": {"1": "chair", "2": "table"},
             "relationships": [[1, 2, 1, "left"]]},
            {"scan": "scan-b", "objects": {"1": "wall"},
             "relationships": []},
        ]}))
    (root / "obj_boxes_train_refined.json").write_text(json.dumps({
        "scan-a": {"1": {"param7": [1, 2, 3, 0.5, 0.6, 0.7, 0]},
                   "2": {"param7": [2, 2, 2, 0, 0, 0, 0]}}}))
    (root / "train.txt").write_text("scan-a\n")   # drop scan-b via the list

    from commonscenes_tpu.data.rscan import RScanDataset
    ds = RScanDataset(str(root), split="train")
    assert len(ds) == 1
    scene = ds[0]
    assert scene.scan_id == "scan-a"
    assert scene.num_objs == 3
    chair_slot = int(np.where(scene.objs ==
                              ds.vocab.class_to_idx["chair"])[0][0])
    np.testing.assert_allclose(scene.boxes[chair_slot],
                               [1, 2, 3, 0.5, 0.6, 0.7])


def test_ply_labeled_roundtrip(tmp_path):
    """objectId-annotated PLY (the 3RScan layout, reference
    dataset/util.py:33-65) round-trips through the property-aware
    reader in both ascii and binary."""
    from commonscenes_tpu.data.ply import read_ply_labeled, write_ply_labeled
    pts = np.random.RandomState(0).randn(37, 3).astype(np.float32)
    ids = np.random.RandomState(1).randint(0, 5, 37)
    for ascii_fmt in (False, True):
        p = str(tmp_path / f"scan_{ascii_fmt}.ply")
        write_ply_labeled(p, pts, ids, ascii_fmt=ascii_fmt)
        rp, rl = read_ply_labeled(p)
        np.testing.assert_allclose(rp, pts, atol=1e-5)
        np.testing.assert_array_equal(rl, ids)


def test_norm_points_semantics():
    """norm_points matches the reference norm_tensor contract
    (dataset/dataset.py:316-362): box-centering, canonical rotation,
    and the three scale functions."""
    from commonscenes_tpu.data.rscan import get_rotation_z, norm_points
    rs = np.random.RandomState(0)
    p = rs.randn(200, 3).astype(np.float32) * 0.3
    p7 = np.array([2.0, 1.0, 0.5, 3.0, -1.0, 0.25, np.deg2rad(30)],
                  np.float32)
    shifted = p + p7[3:6]

    # center only: exact inverse of the shift
    out = norm_points(shifted, p7, center=True)
    np.testing.assert_allclose(out, p, atol=1e-5)

    # diag scaling without rotation: rotate-in/scale/rotate-back ==
    # plain division by the box diagonal
    out = norm_points(shifted, p7, scale=True, scale_func="diag")
    np.testing.assert_allclose(out, p / np.linalg.norm(p7[:3]), atol=1e-5)

    # rotation=True rotates by -angle and does NOT rotate back
    out = norm_points(shifted, p7, scale=True, rotation=True,
                      scale_func="diag")
    expect = (get_rotation_z(-float(p7[6])) @ p.T).T / np.linalg.norm(p7[:3])
    np.testing.assert_allclose(out, expect, atol=1e-5)

    # whl_after maps observed extents exactly onto [-1, 1]
    out = norm_points(shifted, p7, scale=True, scale_func="whl_after",
                      rotation=True)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(out.max(0), 1.0, atol=1e-5)


def test_rscan_legacy_box_stats_roundtrip():
    from commonscenes_tpu.data.rscan import (
        apply_canonical_direction, denormalize_box_params_legacy,
        normalize_box_params_legacy)
    p7 = np.array([1.5, 0.8, 2.0, 0.3, -0.2, 0.1, 1.1], np.float32)
    np.testing.assert_allclose(
        denormalize_box_params_legacy(normalize_box_params_legacy(p7)),
        p7, atol=1e-5)
    # direction 2 (sideways): +90° and W/L swap; 6 is ambiguous → no-op
    c = apply_canonical_direction(p7, 2)
    assert abs(c[6] - (p7[6] + np.pi / 2)) < 1e-6
    assert c[0] == p7[1] and c[1] == p7[0]
    np.testing.assert_array_equal(apply_canonical_direction(p7, 6), p7)


def test_rscan_points_path(tmp_path):
    """End-to-end reference points pipeline (dataset/dataset.py:470-640):
    annotated PLY + semseg.v2.json + boxes → per-instance sampled,
    box-normalized point sets in RawScene.points."""
    from commonscenes_tpu.data.ply import write_ply_labeled
    from commonscenes_tpu.data.rscan import RScanDataset

    root = tmp_path / "rscan_pts"
    root.mkdir()
    (root / "classes.txt").write_text("chair\ntable\n")
    (root / "relationships.txt").write_text("left\nright\n")
    (root / "relationships_train.json").write_text(json.dumps({"scans": [{
        "scan": "scanX_0",
        "objects": {"1": "chair", "2": "table"},
        "relationships": [[1, 2, 1, "left"]],
    }]}))
    (root / "obj_boxes_train_refined.json").write_text(json.dumps({
        "scanX_0": {"1": {"param7": [1, 1, 1, 2.0, 0.0, 0.0, 0.0],
                          "direction": 1},
                    "2": {"param7": [2, 1, 1, -2.0, 0.0, 0.0, 0.0],
                          "direction": 2}}}))
    scan_dir = root / "scanX"
    scan_dir.mkdir()
    (scan_dir / "semseg.v2.json").write_text(json.dumps({"segGroups": [
        {"id": 1, "label": "Chair"}, {"id": 2, "label": "table"}]}))
    rs = np.random.RandomState(0)
    pts1 = rs.randn(300, 3) * 0.2 + np.array([2.0, 0, 0])   # chair cluster
    pts2 = rs.randn(40, 3) * 0.2 + np.array([-2.0, 0, 0])   # table: < npoints
    pts = np.concatenate([pts1, pts2]).astype(np.float32)
    ids = np.concatenate([np.full(300, 1), np.full(40, 2)])
    write_ply_labeled(str(scan_dir / "labels.instances.annotated.v2.ply"),
                      pts, ids)

    ds = RScanDataset(str(root), split="train", use_points=True,
                      npoints=128, use_canonical=True, seed=3)
    scene = ds[0]
    assert scene.points is not None and scene.points.shape == (3, 128, 3)
    assert np.all(scene.points[-1] == 0)            # scene-root slot
    chair = int(np.where(scene.objs == ds.vocab.class_to_idx["chair"])[0][0])
    table = int(np.where(scene.objs == ds.vocab.class_to_idx["table"])[0][0])
    # chair: centered at its box center, diag-scaled — centroid near 0,
    # radius bounded by ~3σ/diag
    assert np.abs(scene.points[chair].mean(0)).max() < 0.15
    assert np.linalg.norm(scene.points[chair], axis=1).max() < 1.5
    # table had 40 < 128 source points: all sampled points come from the
    # normalized source set (repetition fill, not padding zeros)
    assert not np.any(np.all(scene.points[table] == 0, axis=1))
    # canonical direction 2 swapped the table's W/L in the box
    np.testing.assert_allclose(scene.boxes[table][:2], [1.0, 2.0])


def test_partition_vertices_native_matches_numpy():
    """Native counting-sort partition == numpy masked selection, including
    unmatched ids and empty instances."""
    from commonscenes_tpu.data import native as dk
    rs = np.random.RandomState(0)
    vert_ids = rs.randint(0, 9, 5000).astype(np.int32)
    inst = np.array([3, 7, 11, 0], np.int32)   # 11 matches nothing
    idx, off = dk.partition_vertices(vert_ids, inst)
    assert off[0] == 0 and off[-1] == len(idx)
    for i, iid in enumerate(inst):
        got = np.sort(idx[off[i]:off[i + 1]])
        np.testing.assert_array_equal(got, np.where(vert_ids == iid)[0])


def test_partition_vertices_fallback_matches_native(monkeypatch):
    """Force the pure-python fallback (as on .so-less deployments) and
    check it against the same oracle the active path was checked with."""
    from commonscenes_tpu.data import native as dk
    monkeypatch.setattr(dk, "load_library", lambda: None)
    rs = np.random.RandomState(1)
    vert_ids = rs.randint(0, 9, 3000).astype(np.int32)
    inst = np.array([3, 7, 11, 0], np.int32)   # 11 matches nothing
    idx, off = dk.partition_vertices(vert_ids, inst)
    assert off[0] == 0 and off[-1] == len(idx)
    for i, iid in enumerate(inst):
        np.testing.assert_array_equal(np.sort(idx[off[i]:off[i + 1]]),
                                      np.where(vert_ids == iid)[0])
    # empty input: no crash, all-zero offsets
    idx0, off0 = dk.partition_vertices(np.zeros(0, np.int32), inst)
    assert len(idx0) == 0 and off0[-1] == 0


def test_rscan_angle_bins_clamped(tmp_path):
    """rscan folds the reference's train-time [0,24) angle clamp into the
    reader (reference dataset/dataset.py:546 digitizes raw and its train
    script clamps): canonical-direction shifts can push yaw past 2π, which
    must clamp to bin 23, not index 24."""
    import numpy as np
    root = tmp_path / "rscan_ang"
    root.mkdir()
    (root / "classes.txt").write_text("chair\n")
    (root / "relationships.txt").write_text("left\n")
    (root / "relationships_train.json").write_text(json.dumps({"scans": [{
        "scan": "scan-0",
        "objects": {"1": "chair", "2": "chair", "3": "chair"},
        "relationships": [],
    }]}))
    (root / "obj_boxes_train_refined.json").write_text(json.dumps({
        "scan-0": {
            "1": {"param7": [1, 1, 1, 0, 0, 0, 0.0], "direction": 1},
            # yaw 120° with direction 4 (+270°) → 390° > 2π → clamp to 23
            "2": {"param7": [1, 1, 1, 0, 0, 0, np.deg2rad(120.0)],
                  "direction": 4},
            "3": {"param7": [1, 1, 1, 0, 0, 0, np.deg2rad(359.0)],
                  "direction": 1},
        }}))
    from commonscenes_tpu.data.rscan import RScanDataset
    ds = RScanDataset(str(root), split="train", use_canonical=True)
    scene = ds[0]
    assert scene.angles[0] == 0            # yaw 0 → first bin
    assert scene.angles[1] == 23           # overflow clamps, no index 24
    assert scene.angles[2] == 22           # 359° → last in-range interval
    assert scene.angles.max() <= 23 and scene.angles.min() >= 0


def test_rscan_deepsdf_feats(tmp_path):
    """Legacy with_feats path (reference dataset/dataset.py:447-467,
    585-597): per-scan '{atlas}_{large|small}_{splits|merged}_{sec}.pkl'
    caches holding {'feats': [k+1, D], 'instance_order': [k]} arrive
    slot-ordered on RawScene.shape_feats with a zero scene-node row,
    regardless of the pickle's own instance order."""
    import pickle

    root = tmp_path / "rscan_feats"
    root.mkdir()
    (root / "classes.txt").write_text("chair\ntable\nwall\n")
    (root / "relationships.txt").write_text("left\nright\n")
    (root / "relationships_train.json").write_text(json.dumps({"scans": [{
        "scan": "scanf_0",
        "objects": {"1": "chair", "2": "table"},
        "relationships": [[1, 2, 1, "left"]],
    }]}))
    scan_dir = root / "scanf"
    scan_dir.mkdir()
    D = 16
    # pickle in REVERSED instance order (2 before 1) + a stale scene row
    feats = np.stack([np.full(D, 2.0), np.full(D, 1.0),
                      np.full(D, 99.0)]).astype(np.float32)
    with open(scan_dir / "atl_large_merged_0.pkl", "wb") as f:
        pickle.dump({"feats": feats, "instance_order": np.array([2, 1])}, f)

    from commonscenes_tpu.data.rscan import RScanDataset, load_feats_pkl
    ds = RScanDataset(str(root), split="train", with_feats=True,
                      path2atlas="/models/atl.pth", feat_dim=D)
    scene = ds[0]
    assert scene.shape_feats is not None
    assert scene.shape_feats.shape == (3, D)   # chair, table, scene root
    chair_slot = int(np.where(scene.objs ==
                              ds.vocab.class_to_idx["chair"])[0][0])
    table_slot = int(np.where(scene.objs ==
                              ds.vocab.class_to_idx["table"])[0][0])
    np.testing.assert_allclose(scene.shape_feats[chair_slot], 1.0)
    np.testing.assert_allclose(scene.shape_feats[table_slot], 2.0)
    np.testing.assert_allclose(scene.shape_feats[-1], 0.0)   # scene node

    # missing instance in the cache → zero row, not a shape mismatch
    got = load_feats_pkl(str(scan_dir / "atl_large_merged_0.pkl"),
                         [1, 7], feat_dim=D)
    assert got.shape == (3, D)
    np.testing.assert_allclose(got[0], 1.0)
    np.testing.assert_allclose(got[1], 0.0)

    # absent cache file → None (caller falls back to pseudo-codes)
    ds_nofile = RScanDataset(str(root), split="train", with_feats=True,
                             path2atlas="/models/other.pth", feat_dim=D)
    assert ds_nofile[0].shape_feats is None


def test_rscan_memgated_ply_cache(tmp_path, monkeypatch):
    """The scan-points RAM cache only memoizes while host memory is
    plentiful (reference FreeMemLinux.user_free > 5 gate, dataset.py:477)."""
    from commonscenes_tpu.data import rscan as R

    root = tmp_path / "rscan_mem"
    root.mkdir()
    (root / "classes.txt").write_text("chair\n")
    (root / "relationships.txt").write_text("left\n")
    (root / "relationships_train.json").write_text(json.dumps({"scans": [
        {"scan": "s0_0", "objects": {"1": "chair"}, "relationships": []}]}))

    calls = []
    monkeypatch.setattr(R, "read_ply_labeled",
                        lambda p: (calls.append(p) or
                                   (np.zeros((4, 3), np.float32),
                                    np.ones(4, np.int64))))
    ds = R.RScanDataset(str(root), split="train", use_points=True,
                        root_3rscan=str(root))

    monkeypatch.setattr(R, "free_mem_gb", lambda: 0.5)   # memory pressure
    ds._scan_points("s0_0")
    ds._scan_points("s0_0")
    assert len(calls) == 2 and not ds._ply_cache   # re-read, not cached

    monkeypatch.setattr(R, "free_mem_gb", lambda: 64.0)
    ds._scan_points("s0_0")
    ds._scan_points("s0_0")
    assert len(calls) == 3 and "s0" in ds._ply_cache   # cached once
    assert R.free_mem_gb is not None
