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
3. the torch Adam moments are NOT mapped (different optimizer algebra);
   resume restarts optimizer state at the checkpoint's step counter.
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

    merged = torch.load(args.pth, map_location="cpu")
    if hasattr(merged, "state_dict"):
        merged = merged.state_dict()
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

    epoch = args.epoch if args.epoch >= 0 else out["epoch"]
    ckpt_dir = os.path.join(args.exp, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(os.path.join(ckpt_dir, f"model_{epoch}"),
                    jax.device_get(state), epoch=epoch)
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


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
