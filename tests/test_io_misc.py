"""Tests for PLY I/O, splits builder, graph viz, native kernels, vocab."""

import numpy as np

from commonscenes_tpu.data import native
from commonscenes_tpu.data.ply import read_ply, write_ply
from commonscenes_tpu.data.splits import (CSVSplitsBuilder,
                                          filter_scenes_by_room)
from commonscenes_tpu.data.vocab import PREDICATES, Vocab
from commonscenes_tpu.eval.graph_viz import scene_graph_dot


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.randn(10, 3).astype(np.float32)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts)
    back, rgb = read_ply(p)
    np.testing.assert_allclose(back, pts, rtol=1e-5)
    assert rgb is None


def test_ply_roundtrip_binary_rgb(tmp_path, rng):
    pts = rng.randn(7, 3).astype(np.float32)
    rgb = (rng.rand(7, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "b.ply")
    write_ply(p, pts, rgb, ascii_fmt=False)
    back, back_rgb = read_ply(p)
    np.testing.assert_allclose(back, pts, rtol=1e-6)
    np.testing.assert_array_equal(back_rgb, rgb)


def test_splits_builder(tmp_path):
    p = tmp_path / "bedroom_splits.csv"
    p.write_text("SceneA,train\nSceneB,val\nSceneC,test\n")
    b = CSVSplitsBuilder(str(p))
    assert b.train_ids == ["SceneA", "SceneB"]
    assert b.test_ids == ["SceneC"]


def test_room_filter():
    names = ["MasterBedroom-1", "LivingRoom-2", "Library-3", "Bedroom-4"]
    assert filter_scenes_by_room(names, "bedroom") == ["MasterBedroom-1",
                                                       "Bedroom-4"]
    assert filter_scenes_by_room(names, "library") == ["Library-3"]


def test_graph_dot():
    v = Vocab.synthetic()
    objs = [v.class_to_idx["bed"], v.class_to_idx["table"], v.scene_class_id]
    triples = np.array([[0, 1, 1], [0, 0, 2]])
    dot = scene_graph_dot(objs, triples, v.obj_classes, v.predicates,
                          node_new=np.array([0, 1, 0]),
                          scene_class_id=v.scene_class_id)
    assert "digraph" in dot and "left" in dot
    assert dot.count("->") == 1  # scene edge hidden
    assert "#abebc6" in dot      # new-node highlight


def test_vocab_inverse():
    v = Vocab.synthetic()
    left = v.pred_to_idx["left"]
    right = v.pred_to_idx["right"]
    assert v.inverse_pred_id(left) == right
    close = v.pred_to_idx["close by"]
    assert v.inverse_pred_id(close) == close
    assert PREDICATES[0] == "in"


def test_native_fallback_matches_lib(rng, monkeypatch):
    """BOTH paths must match numpy: the active one (native .so when
    present) and the pure-python fallback, forced via monkeypatch."""
    src = rng.randn(2, 4, 4, 4).astype(np.float32)
    sel = np.array([1, -1, 0], np.int32)

    def check(out):
        np.testing.assert_allclose(out[0, ..., 0],
                                   np.clip(src[1], -0.1, 0.1))
        assert np.all(out[1] == 0)
        np.testing.assert_allclose(out[2, ..., 0],
                                   np.clip(src[0], -0.1, 0.1))

    check(native.clamp_pad_sdf(src, sel, 3, 0.1))
    monkeypatch.setattr(native, "load_library", lambda: None)
    check(native.clamp_pad_sdf(src, sel, 3, 0.1))
