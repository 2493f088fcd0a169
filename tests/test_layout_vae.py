"""Layout-VAE forward tests on tiny dims."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import BatchConfig, LayoutConfig
from commonscenes_tpu.data.collate import collate
from commonscenes_tpu.data.synthetic import make_scene
from commonscenes_tpu.data.vocab import Vocab
from commonscenes_tpu.models.layout_vae import LayoutVAE

VOCAB = Vocab.synthetic()
BCFG = BatchConfig(batch_size=2, max_objs=10, max_triples=48)
LCFG = LayoutConfig(embedding_dim=16, gconv_num_layers=2, use_clip=True,
                    clip_dim=32, mlp_normalization="batch",
                    rel_hidden_crossattn=24, rel_out_crossattn=40)


def make_batch(seed=0, modes=("addition",)):
    rng = np.random.RandomState(seed)
    scenes = [make_scene(VOCAB, rng, num_objs=5, clip_dim=32)
              for _ in range(2)]
    return collate(scenes, VOCAB, BCFG, rng, clip_dim=32,
                   manipulation_modes=modes)


def test_forward_shapes_and_finite():
    batch = make_batch()
    model = LayoutVAE(LCFG, VOCAB.num_obj_classes, VOCAB.num_pred_classes,
                      build_rel_encoder=True)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch.enc, batch.dec,
                           batch.node_new, batch.node_changed,
                           jax.random.PRNGKey(1), train=False)
    out, updates = model.apply(variables, batch.enc, batch.dec,
                               batch.node_new, batch.node_changed,
                               jax.random.PRNGKey(2), train=True,
                               mutable=["batch_stats"])
    BN = 2 * 10
    assert out["mu"].shape == (BN, 16)          # 12 box + 4 angle dims
    assert out["logvar"].shape == (BN, 16)
    assert out["boxes"].shape == (BN, 6)
    assert out["angles"].shape == (BN, 24)
    assert out["uc_rel"].shape == (BN, 1, 40)
    assert out["c_rel"].shape == (BN, 1, 40)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    # angle rows are log-probs
    np.testing.assert_allclose(
        np.exp(np.asarray(out["angles"])).sum(axis=1), 1.0, rtol=1e-4)


def test_eval_mode_deterministic_given_key():
    batch = make_batch(seed=1)
    model = LayoutVAE(LCFG, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch.enc,
                           batch.dec, batch.node_new, batch.node_changed,
                           jax.random.PRNGKey(1), train=False)
    o1 = model.apply(variables, batch.enc, batch.dec, batch.node_new,
                     batch.node_changed, jax.random.PRNGKey(5), train=False)
    o2 = model.apply(variables, batch.enc, batch.dec, batch.node_new,
                     batch.node_changed, jax.random.PRNGKey(5), train=False)
    np.testing.assert_allclose(np.asarray(o1["boxes"]), np.asarray(o2["boxes"]))


def test_added_node_latent_zeroed_before_manipulation():
    """The added node's encoder latent must not influence outputs: scrambling
    encoder-view features of the hidden node changes nothing."""
    batch = make_batch(seed=2, modes=("addition",))
    model = LayoutVAE(LCFG, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch.enc,
                           batch.dec, batch.node_new, batch.node_changed,
                           jax.random.PRNGKey(1), train=False)

    # scramble hidden-node box in the ENCODER view only
    node_new = np.asarray(batch.node_new)
    boxes = np.asarray(batch.enc.boxes).copy()
    boxes[node_new > 0] = 99.0
    enc2 = batch.enc.replace(boxes=jnp.asarray(boxes))

    o1 = model.apply(variables, batch.enc, batch.dec, batch.node_new,
                     batch.node_changed, jax.random.PRNGKey(5), train=False)
    o2 = model.apply(variables, enc2, batch.dec, batch.node_new,
                     batch.node_changed, jax.random.PRNGKey(5), train=False)
    np.testing.assert_allclose(np.asarray(o1["boxes"]), np.asarray(o2["boxes"]),
                               atol=1e-5)


def test_v1_box_no_clip():
    cfg = LayoutConfig(embedding_dim=16, gconv_num_layers=2, use_clip=False,
                       mlp_normalization="batch")
    rng = np.random.RandomState(3)
    scenes = [make_scene(VOCAB, rng, num_objs=5, with_clip=False)
              for _ in range(2)]
    batch = collate(scenes, VOCAB, BCFG, rng, use_clip=False)
    model = LayoutVAE(cfg, VOCAB.num_obj_classes, VOCAB.num_pred_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch.enc,
                           batch.dec, batch.node_new, batch.node_changed,
                           jax.random.PRNGKey(1), train=False)
    out = model.apply(variables, batch.enc, batch.dec, batch.node_new,
                      batch.node_changed, jax.random.PRNGKey(2), train=False)
    assert out["boxes"].shape == (20, 6)
    assert out["uc_rel"] is None
