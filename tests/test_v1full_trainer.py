"""v1_full trainer step test (tiny dims)."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import BatchConfig, FullConfig, LayoutConfig, TrainConfig
from commonscenes_tpu.data.collate import collate
from commonscenes_tpu.data.synthetic import make_scene
from commonscenes_tpu.data.vocab import Vocab
from commonscenes_tpu.models.v1_full import V1FullVAE
from commonscenes_tpu.train.step_v1full import V1FullTrainer

VOCAB = Vocab.synthetic()


def test_v1full_train_step():
    bcfg = BatchConfig(batch_size=2, max_objs=8, max_triples=32)
    cfg = FullConfig(network_type="v1_full", batch=bcfg, train=TrainConfig())
    model = V1FullVAE(num_obj_classes=VOCAB.num_obj_classes,
                      num_pred_classes=VOCAB.num_pred_classes,
                      embedding_dim=16, gconv_num_layers=2,
                      gconv_num_shared_layers=2, shape_input_dim=32)
    trainer = V1FullTrainer(cfg, model, VOCAB.num_obj_classes,
                            VOCAB.num_pred_classes)
    rng = np.random.RandomState(0)
    scenes = [make_scene(VOCAB, rng, num_objs=5, with_clip=False)
              for _ in range(2)]
    batch = collate(scenes, VOCAB, bcfg, rng, use_clip=False,
                    manipulation_modes=("addition",))
    shapes_gt = jnp.asarray(rng.randn(16, 32).astype(np.float32))

    state = trainer.init_state(jax.random.PRNGKey(0), batch, shapes_gt)
    s2, metrics = trainer.train_step(state, batch, shapes_gt,
                                     jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(s2.step) == 1
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, s2.params)
    assert max(jax.tree.leaves(diffs)) > 0
    # shape rec loss present
    assert "shape_box_rec" in metrics


def test_v1full_box_discriminator_trains():
    """The reference steps optimizerDbox every iteration for v1_full too
    (train_3dfront.py:355-385,415): boxD params must move and the D-step
    metrics must be reported."""
    bcfg = BatchConfig(batch_size=2, max_objs=8, max_triples=32)
    cfg = FullConfig(network_type="v1_full", batch=bcfg, train=TrainConfig())
    assert cfg.train.weight_d_box > 0
    model = V1FullVAE(num_obj_classes=VOCAB.num_obj_classes,
                      num_pred_classes=VOCAB.num_pred_classes,
                      embedding_dim=16, gconv_num_layers=2,
                      gconv_num_shared_layers=2, shape_input_dim=32)
    trainer = V1FullTrainer(cfg, model, VOCAB.num_obj_classes,
                            VOCAB.num_pred_classes)
    rng = np.random.RandomState(1)
    scenes = [make_scene(VOCAB, rng, num_objs=5, with_clip=False)
              for _ in range(2)]
    batch = collate(scenes, VOCAB, bcfg, rng, use_clip=False,
                    manipulation_modes=("relationship",))
    shapes_gt = jnp.asarray(rng.randn(16, 32).astype(np.float32))

    state = trainer.init_state(jax.random.PRNGKey(0), batch, shapes_gt)
    s2, metrics = trainer.train_step(state, batch, shapes_gt,
                                     jax.random.PRNGKey(1))
    for k in ("boxD", "boxD_real", "boxD_fake", "boxD_reg", "boxG"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    d_diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          state.boxd_params, s2.boxd_params)
    assert max(jax.tree.leaves(d_diff)) > 0, "boxD params did not update"
    a_diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          state.aux_params, s2.aux_params)
    assert max(jax.tree.leaves(a_diff)) > 0, "shape-aux params did not update"
