"""Fixture-tree generator: format validity + derived-relation correctness."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from commonscenes_tpu.data.fixture import write_fixture_tree
    root = str(tmp_path_factory.mktemp("sgfix"))
    man = write_fixture_tree(root, n_train=4, n_test=2, seed=3, sdf_res=32)
    return root, man


@pytest.mark.fast
def test_tree_passes_validator(tree):
    root, man = tree
    from commonscenes_tpu.cli.validate_dataset import main
    rc = main(["--root", root, "--room_type", "bedroom",
               "--sdf_res", "32", "--strict"])
    assert rc == 0


@pytest.mark.fast
def test_gt_sca_is_perfect(tree):
    """Relations are DERIVED from geometry with the SCA rule bands — GT
    boxes must score 100% on every evaluatable rule."""
    root, _ = tree
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    from commonscenes_tpu.eval.constraints import (accuracy_summary,
                                                   validate_constraints)
    acc = None
    for split in ("train", "test"):
        ds = SGFrontDataset(root, split=split, room_type="bedroom")
        for i in range(len(ds)):
            sc = ds[i]
            m, sd = ds._stats7
            boxes = sc.boxes * sd[:6] / 3.0 + m[:6]
            acc = validate_constraints(sc.triples, boxes,
                                       ds.vocab.predicates, accuracy=acc)
    s = accuracy_summary(acc)
    assert len(acc["total"]) > 30
    for rule, v in s.items():
        if v == v:  # rules present in the tree
            assert v == 1.0, (rule, s)


@pytest.mark.fast
def test_reader_loads_sdfs_and_clip(tree):
    root, man = tree
    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(root, split="train", room_type="bedroom",
                        use_sdf=True, sdf_res=32, with_clip=True)
    sc = ds[0]
    assert sc.sdfs is not None and sc.has_sdf.sum() >= 3
    # SDFs are analytic shapes: negative inside, truncated at ±0.2
    real = sc.sdfs[np.asarray(sc.has_sdf)]
    assert real.min() < 0 and np.abs(real).max() <= 0.2 + 1e-6
    assert sc.text_feats is not None and sc.text_feats.shape[1] == 512
    # rel feature rows resolve through the phrase-keyed dict (non-zero)
    assert np.abs(sc.rel_feats).sum() > 0
    # model ids repeat across scans → consistency pairs exist
    ids = ds.model_ids_by_class()
    assert sum(len(v) for v in ids.values()) <= len(man["models"])


@pytest.mark.fast
def test_deterministic(tmp_path):
    from commonscenes_tpu.data.fixture import write_fixture_tree
    import json, os
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_fixture_tree(a, n_train=2, n_test=1, seed=9, sdf_res=16)
    write_fixture_tree(b, n_train=2, n_test=1, seed=9, sdf_res=16)
    for fn in ("obj_boxes_bedroom_trainval.json",
               "relationships_bedroom_test.json"):
        # model_path embeds the tree root (reference obj_boxes convention);
        # normalize it before comparing
        ta = open(os.path.join(a, fn)).read().replace(a, "<root>")
        tb = open(os.path.join(b, fn)).read().replace(b, "<root>")
        assert json.loads(ta) == json.loads(tb)
