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
    # add _scene_ to the mapping so the root class exists
    import json as _json
    with open(os.path.join(sgfront_root, "mapping.json")) as f:
        m = _json.load(f)
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(sgfront_root, split="train", room_type="bedroom",
                        shuffle_objs=False, with_clip=False)
    if "_scene_" in ds.vocab.class_to_idx:
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
