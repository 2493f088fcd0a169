"""Import a reference PyTorch v2_full checkpoint into this framework.

Migration path for users of ymxlzgy/commonscenes: point this at a merged
``model{epoch}.pth`` (one file holding the Sg2ScVAEModel layout weights plus
'vqvae'/'df'/'opt'/'epoch'/'counter' sub-trees, model/VAEGAN_V2FULL.py:
687-699) and it writes an orbax experiment directory that
``cli/eval_3dfront.py`` (and train resume) can load directly:

1. hyperparameters are INFERRED from the state dict shapes
   (train/checkpoints.infer_reference_layout_hparams) — no original CLI
   flags needed;
2. every weight is converted through the parity-tested converters
   (layout GCN/heads, UNet denoiser, VQ-VAE; NCDHW→NDHWC + Linear
   transposes), validated by tests/test_torch_parity.py to fp32 forward
   equality;
3. the torch AdamW moments ARE mapped (train/checkpoints.
   import_reference_adam_moments: exp_avg/exp_avg_sq converted through the
   same permutation converters as their weights, step count seated into
   the optax chain) so resumed training continues the reference optimizer
   trajectory; a checkpoint without an 'opt' sub-dict falls back to cold
   moments with a notice.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="reference model{epoch}.pth")
    p.add_argument("--exp", required=True, help="output experiment dir")
    p.add_argument("--dataset", default="synthetic",
                   help="SG-FRONT root (validates vocab sizes) or 'synthetic'")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--diff_yaml", default=None,
                   help="override the UNet/VQ-VAE config (defaults to the "
                        "shipped configs/v2_full[_concat].yaml)")
    p.add_argument("--epoch", type=int, default=-1,
                   help="checkpoint tag (-1 = the .pth's own epoch)")
    p.add_argument("--pooling", choices=["avg", "sum", "wAvg"], default=None,
                   help="override the GCN pooling. 'sum' and 'avg' have "
                        "IDENTICAL parameters but different forward math, so "
                        "this cannot be inferred from the weights — pass the "
                        "original training flag if it was 'sum'")
    p.add_argument("--conditioning_key", choices=["crossattn", "concat"],
                   default=None,
                   help="override the diffusion conditioning key (guessed "
                        "from rel_out>=4096 otherwise)")
    args = p.parse_args(argv)

    import torch

    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.core.config import (FullConfig, LayoutConfig,
                                              load_full_config)
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.checkpoints import (
        import_reference_v2full_checkpoint, infer_reference_layout_hparams,
        save_checkpoint)
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    try:
        merged = torch.load(args.pth, map_location="cpu")
    except Exception:
        # reference v1_full checkpoints pickle the WHOLE module object
        # (model/VAE.py:110-115) which torch>=2.6 refuses under the
        # weights_only default — the user explicitly pointed us at this
        # file, so load it the way the reference does
        merged = torch.load(args.pth, map_location="cpu",
                            weights_only=False)
    if hasattr(merged, "state_dict"):
        merged = merged.state_dict()

    # v1_full (Graph-to-3D) whole-module checkpoints (model/VAE.py:110-115)
    # have the dual-branch embedding names
    if any(str(k).startswith("obj_embeddings_ec_box") for k in merged):
        return _import_v1full(args, merged)

    hp = infer_reference_layout_hparams(
        {k: v for k, v in merged.items()
         if isinstance(v, torch.Tensor)})
    if args.pooling is not None:
        hp["gconv_pooling"] = args.pooling
    elif hp["gconv_pooling"] == "avg":
        print("[!] gconv_pooling GUESSED as 'avg': 'sum' has identical "
              "parameters but different forward math and cannot be inferred "
              "from weights — pass --pooling sum if the checkpoint was "
              "trained with it", file=sys.stderr)
    if args.conditioning_key is not None:
        hp["conditioning_key"] = args.conditioning_key
    else:
        print(f"[!] conditioning_key GUESSED as "
              f"'{hp['conditioning_key']}' from rel_out={hp['rel_out']} "
              f"(>=4096 → concat); pass --conditioning_key to override",
              file=sys.stderr)
    print("[*] inferred hyperparameters:",
          json.dumps({k: v for k, v in hp.items()}, default=str))

    # vocab: dataset-provided (validated) or placeholder names sized to fit
    if args.dataset != "synthetic":
        vocab = Vocab.from_sgfront(args.dataset, args.room_type)
        assert vocab.num_obj_classes == hp["num_obj_classes"], (
            f"dataset has {vocab.num_obj_classes} classes, checkpoint "
            f"expects {hp['num_obj_classes']}")
        assert vocab.num_pred_classes == hp["num_pred_classes"]
    else:
        names = ["_scene_"] + [f"class_{i:02d}"
                               for i in range(hp["num_obj_classes"] - 1)]
        preds = ["in"] + [f"rel_{i:02d}"
                          for i in range(hp["num_pred_classes"] - 1)]
        vocab = Vocab(obj_classes=sorted(names),
                      obj_classes_grained=sorted(names), predicates=preds)

    base_yaml = args.diff_yaml
    if base_yaml is None:
        cfg_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                               "configs")
        tag = ("v2_full_concat.yaml"
               if hp["conditioning_key"] == "concat" else "v2_full.yaml")
        base_yaml = os.path.join(cfg_dir, tag)
    cfg = load_full_config(base_yaml)
    cfg = cfg.replace(layout=LayoutConfig(
        embedding_dim=hp["embedding_dim"],
        gconv_num_layers=hp["gconv_num_layers"],
        gconv_pooling=hp["gconv_pooling"],
        mlp_normalization=hp["mlp_normalization"],
        residual=hp["residual"], decoder_cat=hp["decoder_cat"],
        use_angles=hp["use_angles"], use_clip=hp["use_clip"],
        clip_dim=hp["clip_dim"] or 512, use_e2=hp["use_e2"],
        **({"rel_hidden_concat": hp["rel_hidden"],
            "rel_out_concat": hp["rel_out"]}
           if hp["conditioning_key"] == "concat" else
           {"rel_hidden_crossattn": hp["rel_hidden"],
            "rel_out_crossattn": hp["rel_out"]})))

    # template state: a shape-only dummy batch valid for ANY vocab (graph
    # content is irrelevant, only array geometry matters for init)
    from commonscenes_tpu.data.collate import RawScene
    rng = np.random.RandomState(0)

    def dummy_scene(i):
        n, m = 5, 6
        R = cfg.batch.sdf_res
        return RawScene(
            objs=rng.randint(0, vocab.num_obj_classes, n).astype(np.int32),
            objs_grained=np.zeros(n, np.int32),
            triples=np.stack([rng.randint(0, n, m),
                              rng.randint(0, vocab.num_pred_classes, m),
                              rng.randint(0, n, m)], 1).astype(np.int32),
            boxes=rng.randn(n, 6).astype(np.float32),
            angles=rng.randint(0, 24, n).astype(np.int32),
            text_feats=rng.randn(n, cfg.layout.clip_dim).astype(np.float32),
            rel_feats=rng.randn(m, cfg.layout.clip_dim).astype(np.float32),
            sdfs=np.zeros((n, R, R, R), np.float32),
            has_sdf=np.ones(n, bool),
            scan_id=f"template-{i}")

    scenes = [dummy_scene(i) for i in range(2)]
    bc = cfg.batch.__class__(batch_size=2, max_objs=cfg.batch.max_objs,
                             max_triples=cfg.batch.max_triples,
                             diffusion_bs=2, sdf_res=cfg.batch.sdf_res)
    batch = collate(scenes, vocab, bc, rng, clip_dim=cfg.layout.clip_dim,
                    use_clip=cfg.layout.use_clip, with_shapes=True)
    model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                               vocab.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    out = import_reference_v2full_checkpoint(
        merged,
        layout_params=state.gen_params["layout"],
        vqvae_params=state.vqvae_params,
        unet_kwargs=dict(model_channels=cfg.unet.model_channels,
                         channel_mult=tuple(cfg.unet.channel_mult),
                         num_res_blocks=cfg.unet.num_res_blocks,
                         attention_resolutions=tuple(
                             cfg.unet.attention_resolutions),
                         transformer_depth=cfg.unet.transformer_depth),
        num_gcn_layers=hp["gconv_num_layers"],
        pooling=hp["gconv_pooling"], residual=hp["residual"],
        use_angles=hp["use_angles"], use_e2=hp["use_e2"])
    layout_params, layout_stats = out["layout"]

    def paths(tree):
        return {jax.tree_util.keystr(pp)
                for pp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}

    missing = paths(state.gen_params["layout"]) - paths(layout_params)
    extra = paths(layout_params) - paths(state.gen_params["layout"])
    assert not missing and not extra, (
        f"layout tree mismatch: missing={sorted(missing)[:5]} "
        f"extra={sorted(extra)[:5]}")

    state = state.replace(
        step=jnp.asarray(out["counter"], jnp.int32),
        # ConditionedDenoiser nests the UNet under "unet"
        gen_params={"layout": layout_params, "df": {"unet": out["df"]}},
        gen_stats={"layout": layout_stats},
        vqvae_params=out["vqvae"])

    # Adam-moment migration (reference load_networks restores the 'opt'
    # sub-dict, model/VAE.py:120-148); falls back to cold optimizer state
    # with a loud warning when the layouts cannot be aligned
    opt_sd = merged.get("opt")
    if opt_sd and opt_sd.get("state"):
        from commonscenes_tpu.train.checkpoints import (
            import_reference_adam_moments, seat_adam_moments)
        layout_sd = {k: v for k, v in merged.items()
                     if isinstance(v, torch.Tensor)}
        unet_kwargs = dict(
            model_channels=cfg.unet.model_channels,
            channel_mult=tuple(cfg.unet.channel_mult),
            num_res_blocks=cfg.unet.num_res_blocks,
            attention_resolutions=tuple(cfg.unet.attention_resolutions),
            transformer_depth=cfg.unet.transformer_depth)
        try:
            mu, nu, opt_count = import_reference_adam_moments(
                layout_sd, merged["df"], opt_sd,
                layout_kwargs=dict(num_gcn_layers=hp["gconv_num_layers"],
                                   pooling=hp["gconv_pooling"],
                                   residual=hp["residual"],
                                   use_angles=hp["use_angles"],
                                   use_e2=hp["use_e2"]),
                unet_kwargs=unet_kwargs)
            state = state.replace(
                gen_opt=seat_adam_moments(state.gen_opt, mu, nu, opt_count))
            print(f"[*] restored Adam moments (step={opt_count})")
        except Exception as e:  # noqa: BLE001
            print(f"[!] could not map optimizer moments ({e!r}); resume "
                  f"starts with cold optimizer state", file=sys.stderr)
    else:
        print("[*] checkpoint carries no optimizer state — resume starts "
              "with cold optimizer moments")

    epoch = args.epoch if args.epoch >= 0 else out["epoch"]
    ckpt_dir = os.path.join(args.exp, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(os.path.join(ckpt_dir, f"model_{epoch}"),
                    state, epoch=epoch)
    rel_keys = ({"rel_hidden_concat": hp["rel_hidden"],
                 "rel_out_concat": hp["rel_out"]}
                if hp["conditioning_key"] == "concat" else
                {"rel_hidden_crossattn": hp["rel_hidden"],
                 "rel_out_crossattn": hp["rel_out"]})
    with open(os.path.join(args.exp, "args.json"), "w") as f:
        json.dump({"network_type": "v2_full", "outf": "checkpoint",
                   "with_CLIP": hp["use_clip"], "with_SDF": True,
                   "pooling": hp["gconv_pooling"],
                   "residual": hp["residual"],
                   "with_angles": hp["use_angles"],
                   "use_E2": hp["use_e2"],
                   "diff_yaml": os.path.abspath(base_yaml),
                   # layout dims the flag surface can't express — consumed
                   # by cli/eval_3dfront.py
                   "layout": {"embedding_dim": hp["embedding_dim"],
                              "clip_dim": hp["clip_dim"] or 512,
                              "gconv_num_layers": hp["gconv_num_layers"],
                              "mlp_normalization": hp["mlp_normalization"],
                              "decoder_cat": hp["decoder_cat"],
                              **rel_keys},
                   "imported_from": os.path.abspath(args.pth)}, f, indent=2)
    print(f"[*] wrote {ckpt_dir}/model_{epoch} "
          f"(counter={out['counter']}, epoch={epoch})")
    return epoch



def _import_v1full(args, merged):
    """Migrate a reference v1_full (Graph-to-3D) whole-module .pth
    (model/VAE.py:110-115) into an orbax experiment evaluable by
    cli/eval_3dfront.py --network_type v1_full."""
    import torch  # noqa: F401  (caller imported; kept for clarity)

    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.core.config import FullConfig, LayoutConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.v1_full import (V1FullVAE,
                                                 pseudo_shape_codes)
    from commonscenes_tpu.train.checkpoints import (
        import_reference_v1full, infer_reference_v1full_hparams,
        save_v1_checkpoint)
    from commonscenes_tpu.train.step_v1full import V1FullTrainer

    sd = {k: v for k, v in merged.items() if hasattr(v, "shape")}
    hp = infer_reference_v1full_hparams(sd)
    if args.pooling is not None:
        hp["gconv_pooling"] = args.pooling
    elif hp["gconv_pooling"] == "avg":
        print("[!] gconv_pooling GUESSED as 'avg' (see v2 note); pass "
              "--pooling sum to override", file=sys.stderr)
    print("[*] inferred v1_full hyperparameters:",
          json.dumps(hp, default=str))

    if args.dataset != "synthetic":
        vocab = Vocab.from_sgfront(args.dataset, args.room_type)
        assert vocab.num_obj_classes == hp["num_obj_classes"]
        assert vocab.num_pred_classes == hp["num_pred_classes"]
    else:
        names = ["_scene_"] + [f"class_{i:02d}"
                               for i in range(hp["num_obj_classes"] - 1)]
        preds = ["in"] + [f"rel_{i:02d}"
                          for i in range(hp["num_pred_classes"] - 1)]
        vocab = Vocab(obj_classes=sorted(names),
                      obj_classes_grained=sorted(names), predicates=preds)

    cfg = FullConfig()
    cfg = cfg.replace(layout=LayoutConfig(
        embedding_dim=hp["embedding_dim"],
        gconv_num_layers=hp["gconv_num_layers"],
        gconv_pooling=hp["gconv_pooling"],
        residual=hp["residual"], use_angles=hp["use_angles"],
        num_box_params=hp["num_box_params"]))

    model = V1FullVAE(
        num_obj_classes=vocab.num_obj_classes,
        num_pred_classes=vocab.num_pred_classes,
        embedding_dim=hp["embedding_dim"],
        gconv_num_layers=hp["gconv_num_layers"],
        gconv_num_shared_layers=hp["gconv_num_shared_layers"],
        gconv_pooling=hp["gconv_pooling"], residual=hp["residual"],
        use_angles=hp["use_angles"],
        num_box_params=hp["num_box_params"],
        shape_input_dim=hp["shape_input_dim"])
    trainer = V1FullTrainer(cfg, model, vocab.num_obj_classes,
                            vocab.num_pred_classes)

    from commonscenes_tpu.data.collate import RawScene
    rng = np.random.RandomState(0)

    def dummy_scene(i, n=5, m=6):
        return RawScene(
            objs=rng.randint(0, vocab.num_obj_classes, n).astype(np.int32),
            objs_grained=np.zeros(n, np.int32),
            triples=np.stack([rng.randint(0, n, m),
                              rng.randint(0, vocab.num_pred_classes, m),
                              rng.randint(0, n, m)], 1).astype(np.int32),
            boxes=rng.randn(n, hp["num_box_params"]).astype(np.float32),
            angles=rng.randint(0, 24, n).astype(np.int32),
            text_feats=None, rel_feats=None, sdfs=None, has_sdf=None,
            scan_id=f"template-{i}")

    bc = cfg.batch.__class__(batch_size=2, max_objs=cfg.batch.max_objs,
                             max_triples=cfg.batch.max_triples,
                             diffusion_bs=2, sdf_res=cfg.batch.sdf_res)
    batch = collate([dummy_scene(i) for i in range(2)], vocab, bc, rng,
                    use_clip=False)
    codes = jnp.asarray(pseudo_shape_codes(np.asarray(batch.dec.objs),
                                           dim=hp["shape_input_dim"]))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, codes)

    params, stats = import_reference_v1full(
        sd, num_gcn_layers=hp["gconv_num_layers"],
        num_shared_layers=hp["gconv_num_shared_layers"],
        pooling=hp["gconv_pooling"], residual=hp["residual"],
        use_angles=hp["use_angles"])

    def paths(tree):
        return {jax.tree_util.keystr(pp)
                for pp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}

    missing = paths(state.params) - paths(params)
    extra = paths(params) - paths(state.params)
    assert not missing and not extra, (
        f"v1_full tree mismatch: missing={sorted(missing)[:5]} "
        f"extra={sorted(extra)[:5]}")
    # per-leaf shape check (the reference shape_net output is hard-coded to
    # 256, VAEGAN_V1FULL.py:172 — a shape_input_dim!=256 checkpoint cannot
    # round-trip through our coupled in/out width)
    tpl = {jax.tree_util.keystr(pp): v.shape for pp, v in
           jax.tree_util.tree_flatten_with_path(state.params)[0]}
    for pp, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        k = jax.tree_util.keystr(pp)
        assert tuple(v.shape) == tuple(tpl[k]), (
            f"shape mismatch at {k}: checkpoint {v.shape} vs model {tpl[k]}")

    state = state.replace(params=params, stats=stats)
    epoch = args.epoch if args.epoch >= 0 else 0
    ckpt_dir = os.path.join(args.exp, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_v1_checkpoint(os.path.join(ckpt_dir, f"model_{epoch}"),
                       state, epoch=epoch)
    with open(os.path.join(args.exp, "args.json"), "w") as f:
        json.dump({"network_type": "v1_full", "outf": "checkpoint",
                   "with_CLIP": False, "with_SDF": False,
                   "pooling": hp["gconv_pooling"],
                   "residual": hp["residual"],
                   "with_angles": hp["use_angles"],
                   "layout": {"embedding_dim": hp["embedding_dim"],
                              "gconv_num_layers": hp["gconv_num_layers"],
                              "gconv_num_shared_layers":
                                  hp["gconv_num_shared_layers"],
                              "shape_input_dim": hp["shape_input_dim"],
                              "num_box_params": hp["num_box_params"]},
                   "imported_from": os.path.abspath(args.pth)}, f, indent=2)
    print(f"[*] wrote {ckpt_dir}/model_{epoch} (v1_full)")
    return epoch


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
