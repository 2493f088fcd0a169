"""Shipped config presets load-test + concat-variant end-to-end smoke."""

import os

import jax
import numpy as np
import pytest

from commonscenes_tpu.core.config import load_full_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.fast
def test_v2_full_config_operating_point():
    cfg = load_full_config(os.path.join(CONFIG_DIR, "v2_full.yaml"))
    assert cfg.diffusion.conditioning_key == "crossattn"
    assert cfg.diffusion.ddim_steps == 100
    assert cfg.diffusion.uc_scale == 3.0
    assert cfg.diffusion.timesteps == 1000
    assert cfg.diffusion.linear_start == 0.00085
    assert cfg.batch.diffusion_bs == 4
    assert cfg.batch.sdf_res == 64
    assert cfg.unet.model_channels == 224
    assert tuple(cfg.unet.channel_mult) == (1, 2, 3)
    assert tuple(cfg.unet.attention_resolutions) == (4, 2)
    assert cfg.unet.context_dim == 1280
    assert cfg.vqvae.n_embed == 8192
    assert cfg.vqvae.embed_dim == 3
    assert tuple(cfg.vqvae.ch_mult) == (1, 2, 4)


@pytest.mark.fast
def test_v2_full_concat_config_operating_point():
    cfg = load_full_config(os.path.join(CONFIG_DIR, "v2_full_concat.yaml"))
    assert cfg.diffusion.conditioning_key == "concat"
    assert cfg.batch.diffusion_bs == 32
    assert cfg.unet.in_channels == 4
    assert cfg.unet.out_channels == 3


@pytest.mark.fast
def test_vqvae_config_loads_standalone():
    from commonscenes_tpu.core.config import VQVAEConfig, load_yaml
    d = load_yaml(os.path.join(CONFIG_DIR, "vqvae_snet.yaml"))
    cfg = VQVAEConfig.from_dict(d)
    assert cfg.resolution == 64 and cfg.z_spatial == 16


def test_concat_variant_end_to_end():
    """Tiny v2_full with conditioning_key=concat: one train step + one
    sample call must run and produce finite outputs (the reference's
    v2_full_concat.yaml operating point, in_channels 4)."""
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    base = tiny_cfg()
    zsp = base.vqvae.z_spatial  # 8 with resolution 16, ch_mult (1,2)
    cfg = base.replace(
        diffusion=base.diffusion.__class__(
            timesteps=50, ddim_steps=5, conditioning_key="concat"),
        unet=base.unet.__class__(
            image_size=zsp, in_channels=4, out_channels=3,
            model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=4, context_dim=None, use_checkpoint=False),
        layout=__import__("dataclasses").replace(
            base.layout, rel_hidden_concat=64, rel_out_concat=zsp ** 3),
    )
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    batch = make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    variables = {
        "layout": {"params": state.gen_params["layout"],
                   "batch_stats": state.gen_stats["layout"]},
        "df": {"params": state.gen_params["df"]},
        "vqvae": {"params": state.vqvae_params},
    }
    D = cfg.layout.box_embedding_dim + cfg.layout.angle_embedding_dim
    out = model.sample(variables, batch.dec,
                       jax.numpy.zeros(D), jax.numpy.eye(D),
                       jax.random.PRNGKey(2), gen_shape=True)
    assert np.isfinite(np.asarray(out["sdf"])).all()
    assert out["sdf"].shape[-1] == 1
