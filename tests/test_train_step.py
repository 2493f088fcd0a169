"""End-to-end train-step test on a tiny v2_full and a sharded variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.core.config import (BatchConfig, DiffusionConfig,
                                          FullConfig, LayoutConfig,
                                          TrainConfig, UNetConfig, VQVAEConfig)
from commonscenes_tpu.data.collate import collate
from commonscenes_tpu.data.synthetic import make_scene
from commonscenes_tpu.data.vocab import Vocab
from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
from commonscenes_tpu.train.step_v2full import V2FullTrainer

VOCAB = Vocab.synthetic()


def tiny_cfg():
    return FullConfig(
        layout=LayoutConfig(embedding_dim=16, gconv_num_layers=2,
                            use_clip=True, clip_dim=32,
                            mlp_normalization="batch",
                            rel_hidden_crossattn=24, rel_out_crossattn=40),
        vqvae=VQVAEConfig(embed_dim=3, n_embed=32, z_channels=3, resolution=16,
                          ch=8, ch_mult=(1, 2), num_res_blocks=1),
        unet=UNetConfig(image_size=8, in_channels=3, out_channels=3,
                        model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=4, context_dim=40, use_checkpoint=False),
        diffusion=DiffusionConfig(timesteps=50, ddim_steps=5),
        batch=BatchConfig(batch_size=2, max_objs=10, max_triples=48,
                          diffusion_bs=2, sdf_res=16),
        train=TrainConfig(),
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    scenes = [make_scene(VOCAB, rng, num_objs=5, sdf_res=cfg.batch.sdf_res,
                         clip_dim=32)
              for _ in range(cfg.batch.batch_size)]
    return collate(scenes, VOCAB, cfg.batch, rng, clip_dim=32,
                   manipulation_modes=("addition", "relationship"),
                   with_shapes=True)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    batch = make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return cfg, model, trainer, batch, state


def test_train_step_runs_and_updates(setup):
    cfg, model, trainer, batch, state = setup
    new_state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    assert int(new_state.step) == 1
    # generator params changed
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.gen_params, new_state.gen_params)
    assert max(jax.tree.leaves(diffs)) > 0
    # frozen vqvae untouched
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                        state.vqvae_params, new_state.vqvae_params)
    assert all(jax.tree.leaves(same))


def test_two_steps_loss_finite(setup):
    cfg, model, trainer, batch, state = setup
    s = state
    for i in range(2):
        s, metrics = trainer.train_step(s, make_batch(cfg, seed=i),
                                        jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["total"]))


def test_sample_shapes(setup):
    cfg, model, trainer, batch, state = setup
    variables = {
        "layout": {"params": state.gen_params["layout"],
                   "batch_stats": state.gen_stats["layout"]},
        "df": {"params": state.gen_params["df"]},
        "vqvae": {"params": state.vqvae_params},
    }
    dz = 16
    out = model.sample(variables, batch.dec,
                       mean_est=jnp.zeros((dz,)),
                       cov_chol=jnp.eye(dz),
                       key=jax.random.PRNGKey(3), gen_shape=True)
    BN = cfg.batch.batch_size * cfg.batch.max_objs
    assert out["boxes"].shape == (BN, 6)
    assert out["angles"].shape == (BN, 24)
    assert out["sdf"].shape == (BN, 16, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out["sdf"])))
