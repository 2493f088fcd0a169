"""Box-variant mesh retrieval (reference helpers/util.py:71-138,
visualize_scene.py:273-298): nearest-box-size model lookup, OBJ loading,
reference placement math, and the v2_box eval export path end-to-end over
a synthetic model database."""

import json
import os

import numpy as np
import pytest

from commonscenes_tpu.eval.box_retrieval import (BoxRetrieval, load_obj_mesh,
                                                 place_mesh)


@pytest.mark.fast
def test_lookup_nearest_by_box_size():
    db = {"chair": {"m_a": [1.0, 1.0, 1.0], "m_b": [2.0, 2.0, 2.0]},
          "table": {"m_c": [3.0, 1.0, 3.0]}}
    r = BoxRetrieval(db)
    assert r.lookup("chair", np.array([0.9, 1.1, 1.0])) == "m_a"
    assert r.lookup("chair", np.array([1.9, 2.0, 2.2])) == "m_b"
    assert r.lookup("table", np.array([9.9, 9.9, 9.9])) == "m_c"
    assert r.lookup("sofa", np.array([1.0, 1.0, 1.0])) is None  # no class


@pytest.mark.fast
def test_load_obj_mesh_and_placement(tmp_path):
    p = str(tmp_path / "raw_model.obj")
    with open(p, "w") as f:
        # quad face with v/vt/vn indices → two fan triangles
        f.write("v 1 0 0\nv 0 1 0\nv -1 0 0\nv 0 -1 0\n"
                "f 1/1/1 2/2/2 3/3/3 4/4/4\n")
    vv, ff = load_obj_mesh(p)
    assert vv.shape == (4, 3) and ff.shape == (2, 3)
    np.testing.assert_array_equal(ff, [[0, 1, 2], [0, 2, 3]])

    # reference rotation convention (util.py:122-131): verts @ R, with
    # R[0,2] = -sin. 90° yaw maps +x → -z, then translate
    out = place_mesh(np.array([[1.0, 0.0, 0.0]]), 90.0,
                     np.array([10.0, 0.0, 0.0]))
    np.testing.assert_allclose(out, [[10.0, 0.0, -1.0]], atol=1e-6)


@pytest.mark.fast
def test_retrieve_scene_skips_root_and_places(tmp_path):
    base = tmp_path / "models" / "m_a"
    base.mkdir(parents=True)
    with open(str(base / "raw_model.obj"), "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    r = BoxRetrieval({"chair": {"m_a": [1.0, 1.0, 1.0]}},
                     model_base=str(tmp_path / "models"))
    boxes = np.array([[1, 1, 1, 5, 0, 0], [1, 1, 1, 0, 0, 0]], np.float32)
    recs = r.retrieve_scene(["chair", "_scene_"], boxes, [0.0, 0.0])
    assert len(recs) == 1 and recs[0]["model_id"] == "m_a"
    vv, ff = recs[0]["mesh"]
    np.testing.assert_allclose(vv[0], [5, 0, 0], atol=1e-6)


def test_eval_cli_box_retrieval_export(tmp_path):
    """--network_type v2_box --export_dir with a synthetic cat_jid database
    writes retrieved-mesh OBJ scenes + per-slot model ids (VERDICT r2 #6)."""
    from commonscenes_tpu.cli.eval_3dfront import main
    from commonscenes_tpu.data.vocab import Vocab

    exp = tmp_path / "exp"
    exp.mkdir()
    with open(str(exp / "args.json"), "w") as f:
        json.dump({"network_type": "v2_box", "with_SDF": False,
                   "with_CLIP": True, "outf": "checkpoint", "bf16": False,
                   "max_objs": 10, "max_triples": 48}, f)

    vocab = Vocab.synthetic()
    model_root = tmp_path / "future"
    db = {}
    for i, cname in enumerate(vocab.obj_classes):
        if cname == "_scene_":
            continue
        mid = f"model_{i}"
        db[cname] = {mid: [0.5 + 0.1 * i, 0.5, 0.5]}
        d = model_root / mid
        d.mkdir(parents=True)
        with open(str(d / "raw_model.obj"), "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    cat_jid = str(tmp_path / "cat_jid.json")
    with open(cat_jid, "w") as f:
        json.dump(db, f)

    out = str(tmp_path / "gen")
    s = main(["--exp", str(exp), "--epoch", "0", "--dataset", "synthetic",
              "--num_scenes", "2", "--eval_batch", "2",
              "--export_dir", out, "--cat_jid", cat_jid,
              "--future_model_dir", str(model_root)])
    assert s["network_type"] == "v2_box"
    with open(os.path.join(out, "layouts.json")) as f:
        layouts = json.load(f)
    assert len(layouts) == 2
    objs = [fn for fn in os.listdir(out) if fn.endswith("_retrieval.obj")]
    assert objs, "no retrieved-mesh OBJ scenes written"
    # bbox outline geometry present (reference render_boxes cylinder edges)
    text = open(os.path.join(out, objs[0])).read()
    assert "o bbox_" in text, "no bbox outline objects in retrieval OBJ"
    glbs = [fn for fn in os.listdir(out) if fn.endswith("_retrieval.glb")]
    assert glbs, "no retrieved-mesh GLB scenes written"
    raw = open(os.path.join(out, glbs[0]), "rb").read()
    assert raw[:4] == b"glTF"
    # per-object OBJs, reference naming {label}_{cat}_{inst}.obj
    obj_dirs = [d for d in os.listdir(out) if d.endswith("_objects")]
    assert obj_dirs, "no per-object export directory"
    per_obj = os.listdir(os.path.join(out, obj_dirs[0]))
    assert per_obj and all(f.endswith(".obj") for f in per_obj)
    for rec in layouts:
        assert "retrieved_boxmesh" in rec
        assert any(v is not None for v in rec["retrieved_boxmesh"].values())
