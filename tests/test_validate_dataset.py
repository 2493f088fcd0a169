"""cli/validate_dataset.py: passes on a well-formed SG-FRONT tree, fails
with an actionable message on each adversarial mutation (VERDICT r3 #7).

The tree mirrors the reference on-disk contract
(dataset/threedfront_dataset.py:50-184, SG-FRONT.md).
"""

import json
import os
import pickle
import shutil

import numpy as np
import pytest

SCAN = "MasterBedroom-77"
MEAN7 = np.array([1.0, 1.1, 0.9, -0.1, 0.6, -0.5, 0.7])
STD7 = np.array([1.5, 1.6, 0.8, 1.9, 2.0, 0.7, 0.5])


def build_tree(root):
    import h5py
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "classes_bedroom.txt"), "w") as f:
        f.write("_scene_\ndouble_bed\nnightstand\nfloor\n")
    with open(os.path.join(root, "relationships.txt"), "w") as f:
        f.write("left\nright\nstanding on\n")
    with open(os.path.join(root, "mapping.json"), "w") as f:
        json.dump({"_scene_": "_scene_", "double_bed": "bed",
                   "nightstand": "nightstand", "floor": "floor"}, f)

    rels = {"scans": [{
        "scan": SCAN,
        "objects": {"1": "double_bed", "2": "nightstand", "3": "floor"},
        "relationships": [[1, 2, 1, "left"], [2, 3, 3, "standing on"]],
    }]}
    model_path = os.path.join(root, "3D-FUTURE-model", "aaaa-bed",
                              "raw_model.obj")
    boxes = {SCAN: {
        "scene_center": [0.5, 0.0, 0.5],
        "1": {"param7": [2.0, 1.0, 1.8, 1.5, 0.5, 1.2, 0.3],
              "model_path": model_path},
        "2": {"param7": [0.5, 0.6, 0.5, -1.0, 0.3, 2.0, -0.2],
              "model_path": None},
        "3": {"param7": [4.0, 0.1, 4.0, 0.0, 0.0, 0.0, 0.0],
              "model_path": None},
    }}
    for split in ("trainval", "test"):
        with open(os.path.join(
                root, f"relationships_bedroom_{split}.json"), "w") as f:
            json.dump(rels, f)
        with open(os.path.join(
                root, f"obj_boxes_bedroom_{split}.json"), "w") as f:
            json.dump(boxes, f)
        np.savetxt(os.path.join(
            root, f"boxes_centered_stats_bedroom_{split}.txt"),
            np.stack([MEAN7, STD7]))

    d = os.path.join(root, "3D-FUTURE-SDF", "aaaa-bed")
    os.makedirs(d, exist_ok=True)
    with h5py.File(os.path.join(d, "ori_sample_grid.h5"), "w") as f:
        f.create_dataset("pc_sdf_sample",
                         data=np.zeros((64 ** 3, 1), np.float32))

    viz = os.path.join(root, "visualization", SCAN)
    os.makedirs(viz, exist_ok=True)
    feats = np.zeros((4, 512), np.float32)  # 3 instances + room row
    with open(os.path.join(viz, f"CLIP_small_{SCAN}.pkl"), "wb") as f:
        pickle.dump({"instance_feats": feats, "instance_order": [1, 2, 3],
                     "rel_feats": {"bed left nightstand":
                                   np.zeros(512, np.float32)}}, f)
    return root


def run(root, *extra):
    from commonscenes_tpu.cli.validate_dataset import main
    return main(["--root", root, "--room_type", "bedroom", *extra])


@pytest.fixture
def tree(tmp_path):
    return build_tree(str(tmp_path / "sgfront"))


@pytest.mark.fast
def test_valid_tree_passes(tree, capsys):
    assert run(tree) == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["valid"] and summary["errors"] == 0
    assert summary["scan_counts"]["bedroom/trainval"] == 1


@pytest.mark.fast
def test_missing_required_file(tree, capsys):
    os.remove(os.path.join(tree, "relationships_bedroom_test.json"))
    assert run(tree) == 1
    assert "missing required file" in capsys.readouterr().out


@pytest.mark.fast
def test_dangling_relationship_endpoint(tree, capsys):
    p = os.path.join(tree, "relationships_bedroom_trainval.json")
    with open(p) as f:
        data = json.load(f)
    data["scans"][0]["relationships"].append([1, 9, 1, "left"])
    with open(p, "w") as f:
        json.dump(data, f)
    assert run(tree) == 1
    assert "undeclared instance" in capsys.readouterr().out


@pytest.mark.fast
def test_predicate_id_out_of_range(tree, capsys):
    p = os.path.join(tree, "relationships_bedroom_trainval.json")
    with open(p) as f:
        data = json.load(f)
    data["scans"][0]["relationships"].append([1, 2, 17, "left"])
    with open(p, "w") as f:
        json.dump(data, f)
    assert run(tree) == 1
    assert "out of range" in capsys.readouterr().out


@pytest.mark.fast
def test_bad_param7(tree, capsys):
    p = os.path.join(tree, "obj_boxes_bedroom_trainval.json")
    with open(p) as f:
        data = json.load(f)
    data[SCAN]["1"]["param7"] = [1.0, 2.0, 3.0]
    with open(p, "w") as f:
        json.dump(data, f)
    assert run(tree) == 1
    assert "not length-7" in capsys.readouterr().out


@pytest.mark.fast
def test_zero_std_stats(tree, capsys):
    bad = np.stack([MEAN7, np.zeros(7)])
    np.savetxt(os.path.join(
        tree, "boxes_centered_stats_bedroom_trainval.txt"), bad)
    assert run(tree) == 1
    assert "non-positive std" in capsys.readouterr().out


@pytest.mark.fast
def test_unknown_label(tree, capsys):
    p = os.path.join(tree, "relationships_bedroom_trainval.json")
    with open(p) as f:
        data = json.load(f)
    data["scans"][0]["objects"]["4"] = "hovercraft"
    with open(p, "w") as f:
        json.dump(data, f)
    # give it a box so only the label check fires
    b = os.path.join(tree, "obj_boxes_bedroom_trainval.json")
    with open(b) as f:
        boxes = json.load(f)
    boxes[SCAN]["4"] = {"param7": [1, 1, 1, 0, 0, 0, 0], "model_path": None}
    with open(b, "w") as f:
        json.dump(boxes, f)
    assert run(tree) == 1
    assert "absent from classes_bedroom.txt" in capsys.readouterr().out


@pytest.mark.fast
def test_wrong_sdf_resolution(tree, capsys):
    import h5py
    p = os.path.join(tree, "3D-FUTURE-SDF", "aaaa-bed", "ori_sample_grid.h5")
    os.remove(p)
    with h5py.File(p, "w") as f:
        f.create_dataset("pc_sdf_sample",
                         data=np.zeros((32 ** 3, 1), np.float32))
    assert run(tree) == 1
    assert "wrong resolution" in capsys.readouterr().out


@pytest.mark.fast
def test_clip_row_count_mismatch(tree, capsys):
    viz = os.path.join(tree, "visualization", SCAN)
    with open(os.path.join(viz, f"CLIP_small_{SCAN}.pkl"), "wb") as f:
        pickle.dump({"instance_feats": np.zeros((2, 512), np.float32),
                     "instance_order": [1, 2, 3],
                     "rel_feats": {}}, f)
    assert run(tree) == 1
    assert "instance_order lists" in capsys.readouterr().out


@pytest.mark.fast
def test_missing_sdf_is_warning_not_error(tree, capsys):
    shutil.rmtree(os.path.join(tree, "3D-FUTURE-SDF"))
    assert run(tree) == 0          # reader zero-fills; warn only
    out = capsys.readouterr().out
    assert "SDF coverage 0.0%" in out
    # --strict promotes the warning
    assert run(tree, "--strict") == 1


@pytest.mark.fast
def test_split_csv_count_check(tree, capsys):
    csv_path = os.path.join(tree, "bedroom_threed_front_splits.csv")
    with open(csv_path, "w") as f:
        for i in range(10):
            f.write(f"MasterBedroom-{i},train\n")
    assert run(tree) == 0
    out = capsys.readouterr().out
    assert "published SG-FRONT count is 6534" in out
    with open(csv_path, "a") as f:
        f.write("MasterBedroom-99,weird_split\n")
    assert run(tree) == 1
    assert "unknown split tags" in capsys.readouterr().out


@pytest.mark.fast
def test_corrupt_json(tree, capsys):
    with open(os.path.join(
            tree, "obj_boxes_bedroom_trainval.json"), "w") as f:
        f.write("{not json")
    assert run(tree) == 1
    assert "invalid JSON" in capsys.readouterr().out
