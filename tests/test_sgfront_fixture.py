"""Real-format SG-FRONT fixture test.

Builds a miniature SG-FRONT tree with the EXACT on-disk formats documented
in the reference (SG-FRONT.md + dataset/threedfront_dataset.py):

* relationships_{room}_{split}.json — scans/objects/relationships with
  [subject_inst, object_inst, 1-based pred id, text] rows;
* obj_boxes_{room}_{split}.json — param7 + scale + model_path per instance,
  scene_center per scene, floor's model_path null;
* boxes_centered_stats_{room}_{split}.txt — 2×7 mean/std rows (np.savetxt);
* classes_{room}.txt + relationships.txt + mapping.json;
* 3D-FUTURE-SDF/<model>/ori_sample_grid.h5 with a flat 'pc_sdf_sample'
  dataset (threedfront_dataset.py:383-392);
* visualization/<scan>/CLIP_small_<scan>.pkl with instance_feats (objects +
  room row), instance_order (write-time instance ids) and rel_feats as a
  DICT keyed by the relation phrase (threedfront_dataset.py:477-507).

and asserts SGFrontDataset reproduces the expected RawScene.
"""

import json
import os
import pickle

import numpy as np
import pytest

SCAN = "MasterBedroom-1"
MEAN7 = np.array([1.0, 1.1, 0.9, -0.1, 0.6, -0.5, 0.7], np.float64)
STD7 = np.array([1.5, 1.6, 0.8, 1.9, 2.0, 0.7, 0.5], np.float64)
PARAM7 = {
    1: [2.0, 1.0, 1.8, 1.5, 0.5, 1.2, 0.3],      # double_bed
    2: [0.5, 0.6, 0.5, -1.0, 0.3, 2.0, -0.2],    # nightstand
    3: [0.4, 0.4, 0.4, 0.0, 2.5, 0.0, 0.0],      # pendant_lamp
    4: [4.0, 0.1, 4.0, 0.0, 0.0, 0.0, 0.0],      # floor (no model)
}
SCENE_CENTER = [0.5, 0.0, 0.5]
MODEL_IDS = {1: "aaaa-bed", 2: "bbbb-stand", 3: "cccc-lamp"}


@pytest.fixture(scope="module")
def sgfront_root(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("sgfront_mini")
    root = str(root)

    with open(os.path.join(root, "classes_bedroom.txt"), "w") as f:
        f.write("_scene_\ndouble_bed\nnightstand\npendant_lamp\nfloor\n")
    with open(os.path.join(root, "relationships.txt"), "w") as f:
        f.write("left\nright\nbigger than\nstanding on\n")
    with open(os.path.join(root, "mapping.json"), "w") as f:
        json.dump({"_scene_": "_scene_", "double_bed": "bed",
                   "nightstand": "nightstand", "pendant_lamp": "lamp",
                   "floor": "floor"}, f)

    rels = {"scans": [{
        "scan": SCAN,
        "objects": {"1": "double_bed", "2": "nightstand",
                    "3": "pendant_lamp", "4": "floor"},
        "relationships": [
            [1, 2, 1, "left"],
            [2, 1, 2, "right"],
            [3, 4, 4, "standing on"],
        ],
    }]}
    boxes = {SCAN: {"scene_center": SCENE_CENTER}}
    for inst, p7 in PARAM7.items():
        entry = {"param7": p7, "scale": [1, 1, 1]}
        if inst in MODEL_IDS:
            entry["model_path"] = os.path.join(
                root, "3D-FUTURE-model", MODEL_IDS[inst], "raw_model.obj")
        else:
            entry["model_path"] = None
        boxes[SCAN][str(inst)] = entry

    for split in ("trainval", "test"):
        with open(os.path.join(root,
                               f"relationships_bedroom_{split}.json"), "w") as f:
            json.dump(rels, f)
        with open(os.path.join(root, f"obj_boxes_bedroom_{split}.json"), "w") as f:
            json.dump(boxes, f)
        np.savetxt(os.path.join(root,
                                f"boxes_centered_stats_bedroom_{split}.txt"),
                   np.stack([MEAN7, STD7]))

    # SDF grids: flat 'pc_sdf_sample' dataset, values exceeding ±0.2 so the
    # reader's clamp is observable
    for inst, mid in MODEL_IDS.items():
        d = os.path.join(root, "3D-FUTURE-SDF", mid)
        os.makedirs(d)
        rng = np.random.RandomState(inst)
        grid = rng.randn(64 * 64 * 64, 1).astype(np.float32)
        with h5py.File(os.path.join(d, "ori_sample_grid.h5"), "w") as f:
            f.create_dataset("pc_sdf_sample", data=grid)

    # CLIP cache pkl exactly as the reference writes it
    viz = os.path.join(root, "visualization", SCAN)
    os.makedirs(viz)
    inst_order = [1, 2, 3, 4]          # write-time (unshuffled) order
    inst_feats = np.stack([np.full(512, float(i), np.float32)
                           for i in inst_order] +
                          [np.full(512, 99.0, np.float32)])  # room row last
    words = ["bed left nightstand", "nightstand right bed",
             "lamp standing on floor",
             "bed in room", "nightstand in room", "lamp in room",
             "floor in room"]
    rel_feats = {w: np.full(512, 1000.0 + wi, np.float32)
                 for wi, w in enumerate(words)}
    with open(os.path.join(viz, f"CLIP_small_{SCAN}.pkl"), "wb") as f:
        pickle.dump({"instance_feats": inst_feats,
                     "instance_order": inst_order,
                     "rel_feats": rel_feats}, f)
    return root


@pytest.mark.fast
def test_reader_reproduces_raw_scene(sgfront_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(sgfront_root, split="train", room_type="bedroom",
                        use_sdf=True, with_clip=True, shuffle_objs=True,
                        seed=3)
    assert len(ds) == 1
    # per-split stats surfaced for eval denormalization
    np.testing.assert_allclose(ds.box_mean, MEAN7[:6])
    np.testing.assert_allclose(ds.box_std, STD7[:6])

    scene = ds[0]
    # coarse classes sorted: _scene_=0, bed=1, floor=2, lamp=3, nightstand=4
    v = ds.vocab
    assert v.obj_classes == ["_scene_", "bed", "floor", "lamp", "nightstand"]
    n = scene.objs.shape[0]
    assert n == 5                      # 4 objects + _scene_ root
    assert scene.objs[-1] == v.scene_class_id

    # recover the reader's (shuffled) instance→slot order via the classes
    cls_of_inst = {1: "bed", 2: "nightstand", 3: "lamp", 4: "floor"}
    slot_of_inst = {}
    for inst, cname in cls_of_inst.items():
        cands = [s for s in range(4)
                 if scene.objs[s] == v.class_to_idx[cname]]
        assert len(cands) == 1
        slot_of_inst[inst] = cands[0]

    # box normalization: z-score ×3 against the split's stats file, centers
    # shifted by scene_center, angle binned over [-180°,180°]/24
    p7 = np.asarray(PARAM7[1], np.float64).copy()
    p7[3:6] -= np.asarray(SCENE_CENTER)
    expect6 = 3.0 * (p7[:6] - MEAN7[:6]) / STD7[:6]
    np.testing.assert_allclose(scene.boxes[slot_of_inst[1]], expect6,
                               rtol=1e-5)
    bins = np.linspace(np.deg2rad(-180), np.deg2rad(180), 24)
    expect_bin = np.clip(int(np.digitize(0.3, bins)) - 1, 0, 23)
    assert scene.angles[slot_of_inst[1]] == expect_bin

    # triples: file predicate ids are 1-based into relationships.txt with
    # 'in'=0 prepended; root edges appended per object
    trip = {tuple(t) for t in scene.triples.tolist()}
    s1, s2, s3, s4 = (slot_of_inst[i] for i in (1, 2, 3, 4))
    assert (s1, 1, s2) in trip         # left
    assert (s2, 2, s1) in trip         # right
    assert (s3, 4, s4) in trip         # standing on
    for s in (s1, s2, s3, s4):
        assert (s, 0, 4) in trip       # 'in' → root slot
    assert len(trip) == 7

    # CLIP pkl reassembly: instance rows permuted by instance_order, room
    # feature last; rel feats keyed by phrase
    for inst, slot in slot_of_inst.items():
        np.testing.assert_allclose(scene.text_feats[slot],
                                   np.full(512, float(inst)))
    np.testing.assert_allclose(scene.text_feats[4], np.full(512, 99.0))
    # relation rows follow the reader's triple order
    word_of = {(s1, 1, s2): "bed left nightstand",
               (s2, 2, s1): "nightstand right bed",
               (s3, 4, s4): "lamp standing on floor"}
    words = ["bed left nightstand", "nightstand right bed",
             "lamp standing on floor", "bed in room", "nightstand in room",
             "lamp in room", "floor in room"]
    base = {w: 1000.0 + wi for wi, w in enumerate(words)}
    for k, t in enumerate(scene.triples.tolist()):
        t = tuple(t)
        if t in word_of:
            np.testing.assert_allclose(scene.rel_feats[k],
                                       np.full(512, base[word_of[t]]))

    # SDFs: loaded + clamped for modeled objects, zero for floor and root
    assert scene.sdfs.shape == (5, 64, 64, 64)
    assert scene.has_sdf[slot_of_inst[1]] and scene.has_sdf[slot_of_inst[3]]
    assert not scene.has_sdf[slot_of_inst[4]] and not scene.has_sdf[4]
    assert np.abs(scene.sdfs).max() <= 0.2 + 1e-6
    assert np.abs(scene.sdfs[slot_of_inst[1]]).max() > 0.19


@pytest.mark.fast
def test_reader_collates_and_feeds_model(sgfront_root):
    """The fixture RawScene must collate into a trainable GraphBatch."""
    import jax.numpy as jnp  # noqa: F401
    from commonscenes_tpu.core.config import BatchConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.sgfront import SGFrontDataset

    ds = SGFrontDataset(sgfront_root, split="train", room_type="bedroom",
                        use_sdf=True, with_clip=True, seed=0)
    cfg = BatchConfig(batch_size=2, max_objs=8, max_triples=16,
                      diffusion_bs=2, sdf_res=64)
    rng = np.random.RandomState(0)
    b = collate([ds[0], ds[0]], ds.vocab, cfg, rng, use_clip=True,
                manipulation_modes=("relationship", "addition"),
                with_shapes=True)
    assert b.dec.objs.shape == (2, 8)
    assert b.shapes.sdf.shape == (2, 64, 64, 64, 1)
    assert float(b.shapes.mask.sum()) == 2.0
    assert b.enc.text_feats.shape == (2, 8, 512)


@pytest.mark.fast
def test_reader_test_split(sgfront_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(sgfront_root, split="test", room_type="bedroom",
                        use_sdf=False, with_clip=False)
    scene = ds[0]
    assert scene.scan_id == SCAN
    assert scene.sdfs is None


@pytest.mark.fast
def test_analyse_dataset_on_fixture(sgfront_root, tmp_path):
    from commonscenes_tpu.cli.analyse_dataset import main
    out = str(tmp_path / "stats.json")
    charts = str(tmp_path / "charts")
    stats = main(["--dataset", sgfront_root, "--room_type", "bedroom",
                  "--num_scenes", "4", "--out", out, "--charts", charts])
    assert os.path.exists(out)
    for fn in ("relationships.png", "classes.png"):
        raw = open(os.path.join(charts, fn), "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) > 1000
    assert stats["relationship_frequencies"]["in"] == 4
    assert stats["relationship_frequencies"]["left"] == 1
    assert stats["class_frequencies"]["bed"] == 1
    assert stats["objs_per_scene"]["max"] == 5


def test_train_cli_on_fixture(sgfront_root, tmp_path):
    """The train CLI must run end-to-end on a real-format SG-FRONT tree
    (JSON/h5/pkl reads inside the prefetch loop, checkpoint written)."""
    from commonscenes_tpu.cli.train_3dfront import main
    exp = str(tmp_path / "exp_fixture")
    main(["--network_type", "v2_box", "--dataset", sgfront_root,
          "--room_type", "bedroom", "--nepoch", "1", "--steps_per_epoch", "2",
          "--batchSize", "2", "--max_objs", "8", "--max_triples", "16",
          "--exp", exp, "--vis_every", "0"])
    assert os.path.exists(os.path.join(exp, "checkpoint", "model_0"))
    assert os.path.exists(os.path.join(exp, "logs", "loss_log.txt"))


@pytest.mark.fast
def test_consistency_cli_reference_format(sgfront_root, tmp_path):
    """consistency_check consumes the reference consistencies_{room}_test
    format (instance-id pairs) via the export's instance_ids mapping."""
    # fake eval export: 3 packed sdf rows for slots of the fixture scene
    export = str(tmp_path / "exp")
    os.makedirs(export)
    rng = np.random.RandomState(0)
    sdfs = np.clip(rng.randn(2, 16, 16, 16) * 0.1, -0.2, 0.2).astype(np.float32)
    # instance 1 → slot 0, instance 2 → slot 1 (layouts.json mapping below)
    np.savez_compressed(os.path.join(export, f"{SCAN}_sdf.npz"),
                        sdf=sdfs, slots=np.asarray([0, 1]))
    with open(os.path.join(export, "layouts.json"), "w") as f:
        json.dump([{"scan_id": SCAN, "objs": [1, 4], "boxes": [[1] * 6] * 2,
                    "angles": [0, 0], "instance_ids": [1, 2, -1]}], f)
    pairs = str(tmp_path / "consistencies_bedroom_test.json")
    with open(pairs, "w") as f:
        json.dump({"scans": [{"scan": SCAN,
                              "objects": {"1": "double_bed",
                                          "2": "nightstand"},
                              "consistency": [[1, 2]]}]}, f)

    from commonscenes_tpu.cli.consistency_check import main
    out = main(["--export_dir", export, "--pairs_json", pairs,
                "--n_points", "256"])
    assert out["consistency_pairs"] == 1
    assert np.isfinite(out["consistency_chamfer"])
