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
    lay = _TorchLayout()
    unet = _torch_unet()
    # real AdamW state over layout+df params in reference order
    # (VAEGAN_V2FULL.py:635-650): a few steps with synthetic grads so
    # exp_avg/exp_avg_sq are populated
    opt = torch.optim.AdamW(list(lay.parameters()) + list(unet.parameters()),
                            lr=1e-4)
    g = torch.Generator().manual_seed(3)
    for _ in range(3):
        opt.zero_grad()
        for p in list(lay.parameters()) + list(unet.parameters()):
            p.grad = torch.randn(p.shape, generator=g) * 0.01
        opt.step()
    merged = dict(lay.state_dict())
    merged["vqvae"] = _torch_vqvae().state_dict()
    merged["df"] = unet.state_dict()
    merged["opt"] = opt.state_dict()
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


def test_imported_adam_moments_land_in_optax_state(imported_exp):
    """The torch exp_avg/exp_avg_sq land (converted) in the restored
    ScaleByAdamState; count carries the torch step (VERDICT r2 #7)."""
    import jax

    from commonscenes_tpu.train.checkpoints import (
        import_reference_adam_moments)

    root, exp = imported_exp
    merged = torch.load(os.path.join(root, "model7.pth"))
    layout_sd = {k: v for k, v in merged.items()
                 if isinstance(v, torch.Tensor)}
    mu, nu, count = import_reference_adam_moments(
        layout_sd, merged["df"], merged["opt"],
        layout_kwargs=dict(num_gcn_layers=NL, pooling="avg", residual=False,
                           use_angles=True, use_e2=True),
        unet_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                         num_res_blocks=1, attention_resolutions=(2,),
                         transformer_depth=1))
    assert count == 3

    # spot-check: the first optimizer param is obj_embeddings_ec.weight
    ref_mu = merged["opt"]["state"][0]["exp_avg"].numpy()
    np.testing.assert_allclose(mu["layout"]["obj_embed_ec"]["embedding"],
                               ref_mu, rtol=1e-6)
    # a Linear param converts with the same transpose as its weight
    names = [k for k in layout_sd
             if not k.endswith(("running_mean", "running_var",
                                "num_batches_tracked"))]
    i_d3 = names.index("d3_embeddings.weight")
    np.testing.assert_allclose(
        mu["layout"]["box_embed"]["kernel"],
        merged["opt"]["state"][i_d3]["exp_avg"].numpy().T, rtol=1e-6)
    # moments are non-trivial (the fixture really stepped the optimizer)
    assert float(np.abs(ref_mu).max()) > 0
    assert all(float(np.max(np.abs(x))) >= 0
               for x in jax.tree.leaves(nu))


def test_adamw_first_update_matches_torch_after_seating():
    """Algebra alignment: seat torch AdamW moments into optax.adamw and the
    next update matches torch's next step exactly (VERDICT r2 #7 'first
    post-import update matches the reference's')."""
    import jax.numpy as jnp
    import optax

    from commonscenes_tpu.train.checkpoints import seat_adam_moments

    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    opt = torch.optim.AdamW(lin.parameters(), lr=1e-4, weight_decay=0.01)
    g = torch.Generator().manual_seed(1)
    grads = [[torch.randn(p.shape, generator=g) for p in lin.parameters()]
             for _ in range(4)]
    for k in range(3):
        opt.zero_grad()
        for p, gr in zip(lin.parameters(), grads[k]):
            p.grad = gr.clone()
        opt.step()

    w_before = lin.weight.detach().numpy().copy()
    b_before = lin.bias.detach().numpy().copy()
    st = opt.state_dict()["state"]

    # params in torch order: weight (idx 0), bias (idx 1); our tree uses the
    # flax convention {"kernel": W.T, "bias": b}
    params = {"kernel": jnp.asarray(w_before.T), "bias": jnp.asarray(b_before)}
    mu = {"kernel": jnp.asarray(st[0]["exp_avg"].numpy().T),
          "bias": jnp.asarray(st[1]["exp_avg"].numpy())}
    nu = {"kernel": jnp.asarray(st[0]["exp_avg_sq"].numpy().T),
          "bias": jnp.asarray(st[1]["exp_avg_sq"].numpy())}

    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = seat_adam_moments(tx.init(params), mu, nu,
                                  int(st[0]["step"]))

    jgrads = {"kernel": jnp.asarray(grads[3][0].numpy().T),
              "bias": jnp.asarray(grads[3][1].numpy())}
    updates, _ = tx.update(jgrads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    # torch takes the same 4th step
    opt.zero_grad()
    for p, gr in zip(lin.parameters(), grads[3]):
        p.grad = gr.clone()
    opt.step()

    np.testing.assert_allclose(np.asarray(new_params["kernel"]).T,
                               lin.weight.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_params["bias"]),
                               lin.bias.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.fast
def test_main_guard_is_last_statement():
    """Running the CLI as a script executes top-level code in order; the
    __main__ guard must come after every function it can reach, or a direct
    `python cli/import_checkpoint.py` raises NameError (it did for
    _import_v1full, which was defined below the guard)."""
    import ast
    import commonscenes_tpu.cli.import_checkpoint as m
    tree = ast.parse(open(m.__file__).read())
    assert isinstance(tree.body[-1], ast.If), \
        "__main__ guard must be the final top-level statement"
