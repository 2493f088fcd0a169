"""Facade dispatch tests over network types (tiny dims)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import (BatchConfig, FullConfig,
                                          LayoutConfig)
from commonscenes_tpu.data.collate import collate
from commonscenes_tpu.data.synthetic import make_scene
from commonscenes_tpu.data.vocab import Vocab
from commonscenes_tpu.models.facade import SceneVAE, preset_layout_config

VOCAB = Vocab.synthetic()
BCFG = BatchConfig(batch_size=2, max_objs=8, max_triples=32)


def small_cfg(network_type):
    return FullConfig(
        network_type=network_type,
        layout=LayoutConfig(embedding_dim=16, gconv_num_layers=2,
                            clip_dim=32, mlp_normalization="batch",
                            rel_hidden_crossattn=24, rel_out_crossattn=40),
        batch=BCFG)


def make_batch(with_clip, seed=0):
    rng = np.random.RandomState(seed)
    scenes = [make_scene(VOCAB, rng, num_objs=4, clip_dim=32,
                         with_clip=with_clip) for _ in range(2)]
    return collate(scenes, VOCAB, BCFG, rng, use_clip=with_clip, clip_dim=32,
                   manipulation_modes=("addition",))


def test_preset_dims():
    base = LayoutConfig()
    assert preset_layout_config("v1_box", base).use_clip is False
    assert preset_layout_config("v2_box", base).use_clip is True
    assert preset_layout_config("v1_full", base).embedding_dim == 128


def test_v1_box_facade():
    cfg = small_cfg("v1_box")
    vae = SceneVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    batch = make_batch(with_clip=False)
    variables = vae.init(jax.random.PRNGKey(0), batch)
    out, updates = vae.forward_mani(variables, batch, jax.random.PRNGKey(1),
                                    train=True)
    assert out["boxes"].shape == (16, 6)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))


def test_v2_box_facade_sampling():
    cfg = small_cfg("v2_box")
    vae = SceneVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    batch = make_batch(with_clip=True)
    variables = vae.init(jax.random.PRNGKey(0), batch)
    mu, _ = vae.encode_means(variables, batch.enc)
    assert mu.shape[1] == 16
    dz = 16
    boxes, angles = vae.sample_boxes(variables, batch.dec,
                                     jnp.zeros((dz,)), jnp.eye(dz),
                                     jax.random.PRNGKey(2))
    assert boxes.shape == (16, 6)
    assert angles.shape == (16, 24)


def test_v1_full_facade():
    cfg = small_cfg("v1_full")
    cfg = cfg.replace(layout=cfg.layout.__class__(
        embedding_dim=16, gconv_num_layers=2, mlp_normalization="batch"))
    vae = SceneVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    batch = make_batch(with_clip=False, seed=2)
    shapes_gt = jnp.zeros((16, 256))
    variables = vae.init(jax.random.PRNGKey(0), batch, shapes_gt=shapes_gt)
    out, updates = vae.forward_mani(variables, batch, jax.random.PRNGKey(1),
                                    train=True, shapes_gt=shapes_gt)
    assert out["boxes"].shape == (16, 6)
    assert out["shapes"].shape == (16, 256)
    assert np.all(np.isfinite(np.asarray(out["shapes"])))


def test_shape_retrieval():
    from commonscenes_tpu.models.v1_full import ShapeRetrieval
    rng = np.random.RandomState(0)
    codes = {f"model_{i}": rng.randn(256).astype(np.float32) for i in range(5)}
    retr = ShapeRetrieval(codes)
    q = np.stack([codes["model_3"], codes["model_1"]])
    assert retr.lookup(q) == ["model_3", "model_1"]


@pytest.mark.fast
def test_shape_retrieval_class_restricted():
    """Reference get_closest_vec restricts candidates to the query's class
    (model/VAE.py:296-319)."""
    import numpy as np
    from commonscenes_tpu.models.v1_full import ShapeRetrieval

    codes = {"bed_1": np.ones(256, np.float32),
             "bed_2": np.full(256, 2.0, np.float32),
             "lamp_1": np.full(256, 1.04, np.float32)}
    r = ShapeRetrieval(codes, class_to_ids={"bed": ["bed_1", "bed_2"],
                                            "lamp": ["lamp_1"]})
    q = np.stack([np.full(256, 1.05, np.float32),
                  np.full(256, 1.05, np.float32)])
    # unrestricted: nearest overall is lamp_1 (1.04); restricted to bed → bed_1
    assert r.lookup(q)[0] == "lamp_1"
    assert r.lookup(q, class_names=["bed", "lamp"]) == ["bed_1", "lamp_1"]
    assert ShapeRetrieval({}).lookup(q) == [None, None]


def test_forward_mani_eval_mode_uniform_updates():
    """train=False must return (out, {}) — not a double-wrapped flax tuple —
    and train=True must return the v2_full-shaped updates tree
    ({'layout': {'batch_stats': ...}}) for every variant."""
    for net, with_clip in (("v1_box", False), ("v2_box", True)):
        cfg = small_cfg(net)
        vae = SceneVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
        batch = make_batch(with_clip=with_clip, seed=3)
        variables = vae.init(jax.random.PRNGKey(0), batch)
        out, updates = vae.forward_mani(variables, batch,
                                        jax.random.PRNGKey(1), train=False)
        assert isinstance(out, dict) and out["boxes"].shape == (16, 6), net
        assert updates == {}, net
        out_t, ups_t = vae.forward_mani(variables, batch,
                                        jax.random.PRNGKey(1), train=True)
        assert "layout" in ups_t and "batch_stats" in ups_t["layout"], net

    cfg = small_cfg("v1_full").replace(layout=LayoutConfig(
        embedding_dim=16, gconv_num_layers=2, mlp_normalization="batch"))
    vae = SceneVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    batch = make_batch(with_clip=False, seed=4)
    shapes_gt = jnp.zeros((16, 256))
    variables = vae.init(jax.random.PRNGKey(0), batch, shapes_gt=shapes_gt)
    out, updates = vae.forward_mani(variables, batch, jax.random.PRNGKey(1),
                                    train=False, shapes_gt=shapes_gt)
    assert isinstance(out, dict) and out["shapes"].shape == (16, 256)
    assert updates == {}
