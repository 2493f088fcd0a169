"""End-to-end reference-checkpoint migration: build a REAL merged torch
checkpoint (actual reference modules), torch.save it, run
cli/import_checkpoint.py, and verify the written orbax experiment restores
and samples."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_torch_parity import (  # noqa: E402
    _TorchLayout, _torch_unet, _torch_vqvae, ADD, ED, NL, NOBJ, NPRED)

TINY_DF = """
model:
  params:
    linear_start: 0.00085
    linear_end: 0.012
    conditioning_key: crossattn
    timesteps: 50
unet:
  params:
    image_size: 8
    in_channels: 3
    out_channels: 3
    model_channels: 32
    num_res_blocks: 1
    attention_resolutions: [2]
    channel_mult: [1, 2]
    num_heads: 4
    context_dim: 40
    use_checkpoint: false
"""
TINY_VQ = """
model:
  params:
    embed_dim: 3
    n_embed: 32
    ddconfig:
      double_z: False
      z_channels: 3
      resolution: 16
      in_channels: 1
      out_ch: 1
      ch: 8
      ch_mult: [1, 2]
      num_res_blocks: 1
      attn_resolutions: []
      dropout: 0.0
"""


@pytest.fixture(scope="module")
def imported_exp(tmp_path_factory):
    d = tmp_path_factory.mktemp("import")
    root = str(d)
    with open(os.path.join(root, "tiny_df.yaml"), "w") as f:
        f.write(TINY_DF)
    with open(os.path.join(root, "tiny_vq.yaml"), "w") as f:
        f.write(TINY_VQ)
    with open(os.path.join(root, "tiny_v2full.yaml"), "w") as f:
        f.write("""
hyper:
    batch_size: 2
dataset:
    res: 16
    trunc_thres: 0.2
network:
    df_cfg: tiny_df.yaml
    ddim_steps: 5
    ddim_eta: 0.0
    uc_scale: 3.0
    vq_cfg: tiny_vq.yaml
""")

    torch.manual_seed(11)
    merged = dict(_TorchLayout().state_dict())
    merged["vqvae"] = _torch_vqvae().state_dict()
    merged["df"] = _torch_unet().state_dict()
    merged["opt"] = {}
    merged["epoch"] = 7
    merged["counter"] = 4321
    pth = os.path.join(root, "model7.pth")
    torch.save(merged, pth)

    exp = os.path.join(root, "exp")
    from commonscenes_tpu.cli.import_checkpoint import main
    epoch = main(["--pth", pth, "--exp", exp,
                  "--diff_yaml", os.path.join(root, "tiny_v2full.yaml")])
    assert epoch == 7
    return root, exp


def test_import_writes_experiment(imported_exp):
    root, exp = imported_exp
    assert os.path.isdir(os.path.join(exp, "checkpoint", "model_7"))
    with open(os.path.join(exp, "args.json")) as f:
        meta = json.load(f)
    assert meta["network_type"] == "v2_full"
    assert meta["layout"]["embedding_dim"] == ED
    assert meta["layout"]["clip_dim"] == ADD
    assert meta["layout"]["gconv_num_layers"] == NL
    assert meta["layout"]["rel_out_crossattn"] == 40


def test_imported_checkpoint_restores_and_samples(imported_exp):
    root, exp = imported_exp
    import dataclasses

    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.core.config import load_full_config
    from commonscenes_tpu.data.collate import RawScene, collate
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.checkpoints import restore_checkpoint
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    with open(os.path.join(exp, "args.json")) as f:
        meta = json.load(f)
    cfg = load_full_config(meta["diff_yaml"])
    cfg = cfg.replace(layout=dataclasses.replace(
        cfg.layout, use_clip=True, use_e2=True, **meta["layout"]))

    names = ["_scene_"] + [f"class_{i:02d}" for i in range(NOBJ - 1)]
    preds = ["in"] + [f"rel_{i:02d}" for i in range(NPRED - 1)]
    vocab = Vocab(obj_classes=sorted(names), obj_classes_grained=sorted(names),
                  predicates=preds)

    rng = np.random.RandomState(1)

    def dummy_scene(i, n=5, m=6):
        return RawScene(
            objs=rng.randint(0, vocab.num_obj_classes, n).astype(np.int32),
            objs_grained=np.zeros(n, np.int32),
            triples=np.stack([rng.randint(0, n, m),
                              rng.randint(0, vocab.num_pred_classes, m),
                              rng.randint(0, n, m)], 1).astype(np.int32),
            boxes=rng.randn(n, 6).astype(np.float32),
            angles=rng.randint(0, 24, n).astype(np.int32),
            text_feats=rng.randn(n, ADD).astype(np.float32),
            rel_feats=rng.randn(m, ADD).astype(np.float32),
            sdfs=np.zeros((n, 16, 16, 16), np.float32),
            has_sdf=np.ones(n, bool), scan_id=f"s{i}")

    scenes = [dummy_scene(i) for i in range(2)]
    bc = cfg.batch.__class__(batch_size=2, max_objs=cfg.batch.max_objs,
                             max_triples=cfg.batch.max_triples,
                             diffusion_bs=2, sdf_res=16)
    batch = collate(scenes, vocab, bc, rng, clip_dim=ADD, with_shapes=True)
    model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                               vocab.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, epoch = restore_checkpoint(
        os.path.join(exp, "checkpoint", "model_7"), state)
    assert epoch == 7
    assert int(state.step) == 4321

    variables = {
        "layout": {"params": state.gen_params["layout"],
                   "batch_stats": state.gen_stats["layout"]},
        "df": {"params": state.gen_params["df"]},
        "vqvae": {"params": state.vqvae_params},
    }
    D = cfg.layout.box_embedding_dim + cfg.layout.angle_embedding_dim
    out = model.sample(variables, batch.dec, jnp.zeros(D), jnp.eye(D),
                       jax.random.PRNGKey(2), gen_shape=True)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.isfinite(np.asarray(out["sdf"])).all()
