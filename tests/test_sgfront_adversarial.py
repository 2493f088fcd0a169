"""Adversarial real-format SG-FRONT fixtures (VERDICT r2 #10): the quirky
corners of threedfront_dataset.py:263-579 — a scene whose edge count
overflows max_triples, objects with missing SDF grids / null model_path,
an empty relationship list, and a livingroom split with different stats.
"""

import json
import os

import numpy as np
import pytest

BIG = "Bedroom-big"
EMPTY = "Bedroom-empty"
LIVING = "LivingRoom-1"

MEAN_B = np.array([1.0, 1.1, 0.9, -0.1, 0.6, -0.5, 0.7], np.float64)
STD_B = np.array([1.5, 1.6, 0.8, 1.9, 2.0, 0.7, 0.5], np.float64)
MEAN_L = np.array([2.0, 0.8, 2.1, 0.3, 0.7, 0.2, 0.1], np.float64)
STD_L = np.array([2.5, 1.1, 2.2, 2.4, 1.5, 2.1, 0.6], np.float64)


def _write_split(root, room, scans, mean, std):
    rels = {"scans": [s["rel"] for s in scans]}
    boxes = {s["rel"]["scan"]: s["boxes"] for s in scans}
    for split in ("trainval", "test"):
        with open(os.path.join(root, f"relationships_{room}_{split}.json"),
                  "w") as f:
            json.dump(rels, f)
        with open(os.path.join(root, f"obj_boxes_{room}_{split}.json"),
                  "w") as f:
            json.dump(boxes, f)
        np.savetxt(os.path.join(root,
                                f"boxes_centered_stats_{room}_{split}.txt"),
                   np.stack([mean, std]))


@pytest.fixture(scope="module")
def adversarial_root(tmp_path_factory):
    import h5py
    root = str(tmp_path_factory.mktemp("sgfront_adv"))

    with open(os.path.join(root, "classes_bedroom.txt"), "w") as f:
        f.write("_scene_\ndouble_bed\nnightstand\npendant_lamp\nfloor\n")
    with open(os.path.join(root, "classes_livingroom.txt"), "w") as f:
        f.write("_scene_\nsofa\ncoffee_table\nfloor\n")
    # NOT inverse-closed on purpose ('bigger than' without 'smaller than')
    # — manipulation must degrade gracefully instead of crashing
    with open(os.path.join(root, "relationships.txt"), "w") as f:
        f.write("left\nright\nbigger than\nstanding on\n")
    with open(os.path.join(root, "mapping.json"), "w") as f:
        json.dump({"_scene_": "_scene_", "double_bed": "bed",
                   "nightstand": "nightstand", "pendant_lamp": "lamp",
                   "floor": "floor", "sofa": "sofa",
                   "coffee_table": "table"}, f)

    # --- big scene: 9 objects, dense edge list (every ordered pair) so
    # 72 inter-object + 9 root edges ≫ small max_triples; object 8 has a
    # model_path but NO SDF on disk; object 9 has model_path null ---
    n_obj = 9
    objects = {str(i): ("double_bed" if i % 2 else "nightstand")
               for i in range(1, n_obj)}
    objects[str(n_obj)] = "floor"
    dense = [[a, b, 1 + ((a + b) % 3), "left"]
             for a in range(1, n_obj + 1)
             for b in range(1, n_obj + 1) if a != b]
    big_boxes = {"scene_center": [0.0, 0.0, 0.0]}
    for i in range(1, n_obj + 1):
        entry = {"param7": [1.0, 1.0, 1.0, 0.1 * i, 0.5, -0.1 * i, 0.0],
                 "scale": [1, 1, 1]}
        if i == n_obj:
            entry["model_path"] = None           # floor
        else:
            # instance 5 reuses instance 1's model → a GT 'same as'
            # consistency pair (collect_consistency.py:281-287)
            mid = "model-01" if i == 5 else f"model-{i:02d}"
            entry["model_path"] = os.path.join(
                root, "3D-FUTURE-model", mid, "raw_model.obj")
        big_boxes[str(i)] = entry
    # SDF grids exist only for odd instances — even ones exercise the
    # missing-grid path (has_sdf False, zero grid)
    for i in range(1, n_obj):
        if i % 2 == 0:
            continue
        d = os.path.join(root, "3D-FUTURE-SDF", f"model-{i:02d}")
        os.makedirs(d)
        with h5py.File(os.path.join(d, "ori_sample_grid.h5"), "w") as f:
            f.create_dataset(
                "pc_sdf_sample",
                data=np.full((64 ** 3, 1), 0.05 * i, np.float32))

    # --- empty-relationship scene: objects but rels == [] ---
    empty_rel = {"scan": EMPTY,
                 "objects": {"1": "double_bed", "2": "floor"},
                 "relationships": []}
    empty_boxes = {"scene_center": [0.0, 0.0, 0.0],
                   "1": {"param7": [2, 1, 2, 0, 0.5, 0, 0.1],
                         "scale": [1, 1, 1], "model_path": None},
                   "2": {"param7": [4, .1, 4, 0, 0, 0, 0],
                         "scale": [1, 1, 1], "model_path": None}}

    _write_split(root, "bedroom",
                 [{"rel": {"scan": BIG, "objects": objects,
                           "relationships": dense}, "boxes": big_boxes},
                  {"rel": empty_rel, "boxes": empty_boxes}],
                 MEAN_B, STD_B)

    # --- livingroom split with different stats ---
    liv_rel = {"scan": LIVING,
               "objects": {"1": "sofa", "2": "coffee_table", "3": "floor"},
               "relationships": [[1, 2, 1, "left"]]}
    liv_boxes = {"scene_center": [0.5, 0.0, 0.5],
                 "1": {"param7": [2, 1, 1, 1, 0.5, 0, 0.2],
                       "scale": [1, 1, 1], "model_path": None},
                 "2": {"param7": [1, .5, 1, -1, .3, 0, 0],
                       "scale": [1, 1, 1], "model_path": None},
                 "3": {"param7": [5, .1, 5, 0, 0, 0, 0],
                       "scale": [1, 1, 1], "model_path": None}}
    _write_split(root, "livingroom", [{"rel": liv_rel, "boxes": liv_boxes}],
                 MEAN_L, STD_L)
    return root


@pytest.mark.fast
def test_big_scene_missing_sdfs_and_overflow(adversarial_root):
    from commonscenes_tpu.core.config import BatchConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.sgfront import SGFrontDataset

    ds = SGFrontDataset(adversarial_root, split="train",
                        room_type="bedroom", use_sdf=True, with_clip=False,
                        shuffle_objs=False, seed=0)
    assert len(ds) == 2
    scenes = {ds[i].scan_id: ds[i] for i in range(2)}
    big = scenes[BIG]
    assert big.objs.shape[0] == 10       # 9 objects + root
    assert big.triples.shape[0] == 72 + 9
    # odd instances have grids; even ones fall back to zero + has_sdf=False
    assert big.has_sdf.sum() == 4        # instances 1,3,5,7 (floor+root no)
    assert np.abs(big.sdfs[~big.has_sdf]).max() == 0.0

    # collate with max_triples far below the edge count: keeps ALL 9 root
    # 'in' edges and truncates inter-object edges
    cfg = BatchConfig(batch_size=1, max_objs=12, max_triples=16,
                      diffusion_bs=2, sdf_res=64)
    rng = np.random.RandomState(0)
    b = collate([big], ds.vocab, cfg, rng, use_clip=False,
                with_shapes=True)
    trips = b.dec.triples[0][np.asarray(b.dec.triple_mask[0]) > 0]
    root_edges = [t for t in trips.tolist() if t[1] == 0]
    assert len(trips) == 16
    assert len(root_edges) == 9
    # shape selection only picks objects that actually have SDFs
    sel_mask = np.asarray(b.shapes.mask)
    assert sel_mask.sum() >= 1


@pytest.mark.fast
def test_empty_relationship_scene(adversarial_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(adversarial_root, split="train",
                        room_type="bedroom", use_sdf=False, with_clip=False,
                        shuffle_objs=False, seed=0)
    scenes = {ds[i].scan_id: ds[i] for i in range(2)}
    empty = scenes[EMPTY]
    # only the appended root edges remain
    assert empty.triples.shape[0] == 2
    assert (empty.triples[:, 1] == 0).all()


@pytest.mark.fast
def test_livingroom_split_stats(adversarial_root):
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    bed = SGFrontDataset(adversarial_root, split="train",
                         room_type="bedroom", use_sdf=False,
                         with_clip=False)
    liv = SGFrontDataset(adversarial_root, split="train",
                         room_type="livingroom", use_sdf=False,
                         with_clip=False)
    np.testing.assert_allclose(liv.box_mean, MEAN_L[:6])
    np.testing.assert_allclose(liv.box_std, STD_L[:6])
    assert not np.allclose(liv.box_mean, bed.box_mean)
    assert liv.vocab.obj_classes != bed.vocab.obj_classes
    s = liv[0]
    # livingroom normalization uses ITS stats
    p7 = np.array([2, 1, 1, 1, 0.5, 0, 0.2], np.float64)
    p7[3:6] -= np.array([0.5, 0.0, 0.5])
    expect = 3.0 * (p7[:6] - MEAN_L[:6]) / STD_L[:6]
    slot = int(np.where(s.objs == liv.vocab.class_to_idx["sofa"])[0][0])
    np.testing.assert_allclose(s.boxes[slot], expect, rtol=1e-5)


def test_train_cli_on_adversarial_tree(adversarial_root, tmp_path):
    """The train CLI survives the overflow/missing-SDF/empty-rel scenes."""
    from commonscenes_tpu.cli.train_3dfront import main
    exp = str(tmp_path / "exp_adv")
    main(["--network_type", "v2_box", "--dataset", adversarial_root,
          "--room_type", "bedroom", "--with_CLIP", "False",
          "--nepoch", "1", "--steps_per_epoch", "2", "--batchSize", "2",
          "--max_objs", "12", "--max_triples", "16", "--exp", exp])
    assert os.path.isdir(os.path.join(exp, "checkpoint", "model_0"))


@pytest.mark.fast
def test_collect_consistency_cli(adversarial_root, tmp_path):
    """GT-side consistency collection (reference collect_consistency.py
    live path): same-model instance pairs → consistencies json + DOT."""
    from commonscenes_tpu.cli.collect_consistency import main
    out = str(tmp_path / "consistencies_bedroom_test.json")
    graphs = str(tmp_path / "graphs")
    s = main(["--dataset", adversarial_root, "--room_type", "bedroom",
              "--split", "test", "--out", out, "--graphs_dir", graphs])
    assert s["scenes"] == 2 and s["pairs"] == 1
    with open(out) as f:
        d = json.load(f)
    recs = {r["scan"]: r for r in d["scans"]}
    assert recs[BIG]["consistency"] == [[1, 5, 16, "same as"]]
    assert recs[EMPTY]["consistency"] == []
    assert recs[BIG]["objects"]["1"] == "double_bed"
    assert os.path.exists(os.path.join(graphs, f"{BIG}.dot"))
