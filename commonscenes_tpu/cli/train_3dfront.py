"""Training CLI — the reference ``scripts/train_3dfront.py`` flag surface on
the TPU-native stack.

Supports the four network types: v1_box / v2_box / v2_full run through
``V2FullTrainer`` (shape branch enabled only for v2_full); v1_full runs
through ``V1FullTrainer`` with GT DeepSDF codes (from the dataset's
DEEPSDF_reconstruction tree when present, pseudo-codes otherwise). Data
comes from a real SG-FRONT root or the synthetic generator
(``--dataset synthetic``); periodic orbax checkpoints, args.json snapshot
for eval reproducibility (reference train_3dfront.py:260-263), bad-batch
skip guard (reference :276-283), and data-parallel execution over all
local devices via the mesh utilities.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def bool_flag(s: str) -> bool:
    if s.lower() in ("1", "true", "yes", "y"):
        return True
    if s.lower() in ("0", "false", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"invalid bool {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag surface (scripts/train_3dfront.py:27-80)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--auxlr", type=float, default=1e-4)
    p.add_argument("--lr_milestones", default="",
                   help="comma-separated step boundaries for the step-wise "
                        "LR decay (default 20000,60000,100000 — reference "
                        "VAEGAN_V2FULL.py:620-669); scale down for short "
                        "fixture runs, e.g. 300,600,900")
    p.add_argument("--nepoch", type=int, default=200)
    p.add_argument("--outf", type=str, default="checkpoint")
    p.add_argument("--dataset", type=str, default="synthetic",
                   help="SG-FRONT root, or 'synthetic'")
    p.add_argument("--logf", default="logs")
    p.add_argument("--exp", default="./experiments/layout_test")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--residual", type=bool_flag, default=False)
    p.add_argument("--pooling", type=str, default="avg")
    p.add_argument("--large", type=bool_flag, default=False)
    p.add_argument("--use_scene_rels", type=bool_flag, default=True)
    p.add_argument("--use_E2", type=bool_flag, default=True)
    p.add_argument("--with_SDF", type=bool_flag, default=False)
    p.add_argument("--with_CLIP", type=bool_flag, default=True)
    p.add_argument("--shuffle_objs", type=bool_flag, default=True)
    p.add_argument("--with_angles", type=bool_flag, default=True)
    p.add_argument("--num_box_params", type=int, default=6)
    p.add_argument("--weight_D_box", type=float, default=0.1)
    p.add_argument("--with_changes", type=bool_flag, default=True)
    p.add_argument("--loadmodel", type=bool_flag, default=False)
    p.add_argument("--loadepoch", type=int, default=90)
    p.add_argument("--replace_latent", type=bool_flag, default=True)
    p.add_argument("--network_type", default="v2_full",
                   choices=["v2_box", "v2_full", "v1_box", "v1_full"])
    p.add_argument("--diff_yaml", default=None,
                   help="reference-style v2_full.yaml (optional)")
    # TPU-native extras
    p.add_argument("--max_objs", type=int, default=16)
    p.add_argument("--max_triples", type=int, default=128)
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="cap steps/epoch (0 = full dataset)")
    p.add_argument("--num_scenes", type=int, default=64,
                   help="synthetic dataset size")
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--bf16", type=bool_flag, default=True)
    p.add_argument("--prefetch", type=int, default=2,
                   help="host-side batch prefetch depth (0 = synchronous)")
    p.add_argument("--vis_every", type=int, default=1000,
                   help="render generated-vs-GT shapes every N steps "
                        "(v2_full only; 0 = off; reference "
                        "train_3dfront.py:442-446)")
    p.add_argument("--log_every", type=int, default=100,
                   help="scalar-log cadence in steps (reference Visualizer "
                        "print_freq, scripts/train_3dfront.py:330)")
    p.add_argument("--save_every", type=int, default=15,
                   help="checkpoint every N epochs (reference cadence "
                        "epoch %% 15, scripts/train_3dfront.py:560; the "
                        "final epoch always saves; 0 = final epoch only — "
                        "each v2_full save fetches the 5.35 GB state over "
                        "the device link, ~9 min on the tunneled TPU)")
    p.add_argument("--debug_nans", type=bool_flag, default=False,
                   help="enable jax_debug_nans: every jitted program "
                        "re-runs un-jitted on a NaN and raises at the "
                        "producing primitive — the JAX equivalent of the "
                        "reference's torch.autograd.set_detect_anomaly "
                        "(train_3dfront.py:265)")
    return p


def build_config(args):
    from commonscenes_tpu.core.config import (BatchConfig, FullConfig,
                                              LayoutConfig, TrainConfig,
                                              load_full_config)
    if args.diff_yaml:
        cfg = load_full_config(args.diff_yaml)
    else:
        cfg = FullConfig()
    use_clip = args.with_CLIP and args.network_type != "v1_box"
    # v1_full runs at embedding_dim=128 (reference VAE.py:48); the v2
    # variants at 64 (VAE.py:57)
    layout_extra = ({"embedding_dim": 128}
                    if args.network_type == "v1_full" else {})
    cfg = cfg.replace(
        network_type=args.network_type,
        layout=LayoutConfig(
            gconv_pooling=args.pooling, residual=args.residual,
            use_angles=args.with_angles, num_box_params=args.num_box_params,
            use_clip=use_clip, use_e2=args.use_E2,
            replace_latent=args.replace_latent,
            with_changes=args.with_changes, **layout_extra),
        batch=BatchConfig(
            batch_size=args.batchSize, max_objs=args.max_objs,
            max_triples=args.max_triples,
            diffusion_bs=cfg.batch.diffusion_bs,
            sdf_res=cfg.batch.sdf_res),
        train=TrainConfig(aux_lr=args.auxlr, nepoch=args.nepoch,
                          weight_d_box=args.weight_D_box, seed=args.seed,
                          **({"lr_milestones": tuple(
                                  int(m) for m in
                                  args.lr_milestones.split(","))}
                             if args.lr_milestones else {})),
    )
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from commonscenes_tpu.core.config import FullConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import SyntheticDataset
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                                shard_batch)
    from commonscenes_tpu.train.checkpoints import (restore_checkpoint,
                                                    save_checkpoint)
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    cfg = build_config(args)
    with_shapes = args.network_type == "v2_full"
    use_clip = cfg.layout.use_clip

    # data
    if args.dataset == "synthetic":
        vocab = Vocab.synthetic()
        dataset = SyntheticDataset(
            vocab, num_scenes=args.num_scenes,
            num_objs_range=(4, max(4, cfg.batch.max_objs - 2)),
            sdf_res=cfg.batch.sdf_res if with_shapes else 0,
            seed=args.seed, with_clip=use_clip)
    else:
        from commonscenes_tpu.data.clip_cache import ClipTextCache
        from commonscenes_tpu.data.sgfront import SGFrontDataset
        clip_cache = ClipTextCache(
            cache_path=os.path.join(args.exp, "clip_cache.pkl"))
        dataset = SGFrontDataset(
            args.dataset, split="train", room_type=args.room_type,
            large=args.large, use_sdf=with_shapes,
            sdf_res=cfg.batch.sdf_res, use_scene_rels=args.use_scene_rels,
            shuffle_objs=args.shuffle_objs, with_clip=use_clip,
            clip_cache=clip_cache, seed=args.seed)
        vocab = dataset.vocab

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.bf16 else None
    v1_full = args.network_type == "v1_full"
    if v1_full:
        from commonscenes_tpu.models.v1_full import V1FullVAE
        from commonscenes_tpu.train.step_v1full import V1FullTrainer
        model = V1FullVAE(num_obj_classes=vocab.num_obj_classes,
                          num_pred_classes=vocab.num_pred_classes,
                          embedding_dim=cfg.layout.embedding_dim,
                          gconv_num_layers=cfg.layout.gconv_num_layers,
                          gconv_num_shared_layers=(
                              cfg.layout.gconv_num_shared_layers),
                          shape_input_dim=cfg.layout.shape_input_dim,
                          gconv_pooling=cfg.layout.gconv_pooling,
                          residual=cfg.layout.residual,
                          use_angles=cfg.layout.use_angles,
                          num_box_params=cfg.layout.num_box_params,
                          replace_latent=cfg.layout.replace_latent,
                          dtype=dtype)
        trainer = V1FullTrainer(cfg, model, vocab.num_obj_classes,
                                vocab.num_pred_classes)
    else:
        model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                                   vocab.num_pred_classes, dtype=dtype)
        trainer = V2FullTrainer(cfg, model, with_shapes=with_shapes)

    # GT DeepSDF codes database (reference VAE.py:38-46 reads per-model
    # codes from disk at train time)
    gt_codes = None
    if v1_full and args.dataset != "synthetic":
        deepsdf_root = os.path.join(args.dataset, "DEEPSDF_reconstruction")
        if os.path.isdir(os.path.join(deepsdf_root, "Codes")):
            from commonscenes_tpu.models.v1_full import ShapeRetrieval
            gt_codes = ShapeRetrieval.from_deepsdf_dir(deepsdf_root).codes
            print(f"[*] loaded {len(gt_codes)} GT DeepSDF codes "
                  f"from {deepsdf_root}")

    def shape_codes_for(batch, scenes=None):
        """GT DeepSDF codes for v1_full (reference VAE.py:38-46): real codes
        from the dataset's DEEPSDF_reconstruction tree when present, with
        deterministic per-class pseudo-codes filling slots whose model has
        no code (and the whole batch when the tree is absent)."""
        from commonscenes_tpu.models.v1_full import pseudo_shape_codes
        objs = np.asarray(batch.dec.objs)
        codes = pseudo_shape_codes(
            objs, dim=cfg.layout.shape_input_dim).reshape(
            objs.shape[0], objs.shape[1], -1)
        if scenes is not None:
            # legacy 3RScan with_feats caches arrive slot-ordered on the
            # scene itself (data/rscan.py, reference dataset.py:585-597)
            for b, scene in enumerate(scenes):
                sf = getattr(scene, "shape_feats", None)
                if sf is None:
                    continue
                k = min(sf.shape[0], codes.shape[1])
                w = min(sf.shape[1], codes.shape[-1])
                codes[b, :k, :w] = sf[:k, :w]
        if gt_codes and scenes is not None:
            for b, scene in enumerate(scenes):
                if scene.instance_ids is None:
                    continue
                mids = dataset.model_ids_for_scan(scene.scan_id)
                for j, inst in enumerate(
                        scene.instance_ids[:objs.shape[1]]):
                    c = gt_codes.get(mids.get(int(inst), ""))
                    if c is not None:
                        w = min(c.shape[0], codes.shape[-1])
                        codes[b, j, :w] = c[:w]
        return jnp.asarray(codes.reshape(-1, codes.shape[-1]))

    rng = np.random.RandomState(args.seed)
    modes = ["relationship", "addition", "none"] if args.with_changes else ["none"]

    def next_batch(epoch_rng):
        idx = epoch_rng.randint(0, len(dataset), size=cfg.batch.batch_size)
        scenes = [dataset[i] for i in idx]
        return collate(scenes, vocab, cfg.batch, epoch_rng,
                       use_clip=use_clip,
                       manipulation_modes=tuple(
                           modes[epoch_rng.randint(len(modes))]
                           for _ in range(cfg.batch.batch_size)),
                       with_shapes=with_shapes), scenes

    os.makedirs(os.path.join(args.exp, args.outf), exist_ok=True)
    with open(os.path.join(args.exp, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    mesh = make_mesh()
    key = jax.random.PRNGKey(args.seed)
    batch0, scenes0 = next_batch(rng)
    with mesh:
        if v1_full:
            state = trainer.init_state(key, batch0,
                                       shape_codes_for(batch0, scenes0))
        else:
            state = trainer.init_state(key, batch0)
        state = replicate_tree(mesh, state)
        start_epoch = 0
        ckpt_dir = os.path.join(args.exp, args.outf)
        if args.loadmodel and not v1_full:
            state, start_epoch = restore_checkpoint(
                os.path.join(ckpt_dir, f"model_{args.loadepoch}"), state)
            print(f"[*] resumed from epoch {start_epoch}, "
                  f"counter {int(state.step)}")
        elif args.loadmodel and v1_full:
            from commonscenes_tpu.train.checkpoints import \
                restore_v1_checkpoint
            state, start_epoch = restore_v1_checkpoint(
                os.path.join(ckpt_dir, f"model_{args.loadepoch}"), state)
            print(f"[*] resumed v1_full from epoch {start_epoch}, "
                  f"counter {int(state.step)}")

        steps = args.steps_per_epoch or max(1, len(dataset) // cfg.batch.batch_size)
        log_path = os.path.join(args.exp, args.logf)
        os.makedirs(log_path, exist_ok=True)
        # scalar observability: loss_log.txt + metrics.jsonl + TB when
        # available (reference Visualizer, diff_utils/visualizer.py:80-138)
        from commonscenes_tpu.utils.observability import MetricLogger
        logger = MetricLogger(log_path)

        counter = int(state.step)
        skipped_batches = 0

        visualizer = None
        if args.vis_every and with_shapes and not v1_full:
            from commonscenes_tpu.utils.observability import SampleVisualizer
            visualizer = SampleVisualizer(
                model, args.exp, vocab.scene_class_id,
                box_mean=getattr(dataset, "box_mean", None),
                box_std=getattr(dataset, "box_std", None))

        def _skip(i, e):
            nonlocal skipped_batches
            skipped_batches += 1
            print(f"[!] skipping bad batch #{i}: {e!r} "
                  f"({skipped_batches} skipped so far)")

        for epoch in range(start_epoch, args.nepoch):
            t0 = time.time()
            if args.prefetch > 0:
                # overlap h5/pkl reads + padding with device compute
                # (reference hides this behind DataLoader workers,
                # train_3dfront.py:197-204)
                from commonscenes_tpu.data.prefetch import BatchPrefetcher
                batches = BatchPrefetcher(lambda i: next_batch(rng), steps,
                                          depth=args.prefetch, on_error=_skip)
            else:
                def _sync_gen():
                    for i in range(steps):
                        # bad-batch guard (reference train_3dfront.py:276-283)
                        try:
                            yield next_batch(rng)
                        except Exception as e:  # noqa: BLE001
                            _skip(i, e)
                batches = _sync_gen()

            steps_done = 0
            for raw_batch, raw_scenes in batches:
                batch = shard_batch(mesh, raw_batch)
                key, sub = jax.random.split(key)
                if v1_full:
                    state, metrics = trainer.train_step(
                        state, batch, shape_codes_for(raw_batch, raw_scenes),
                        sub)
                else:
                    state, metrics = trainer.train_step(state, batch, sub)
                counter += 1
                steps_done += 1
                if args.log_every and counter % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    # surface the step-wise LR decay (VAEGAN_V2FULL.py:620-669)
                    idx = sum(counter >= ms
                              for ms in cfg.train.lr_milestones)
                    m["lr"] = cfg.train.lr * cfg.train.lr_factors[idx]
                    logger.log(counter, m)
                    logger.message(
                        f"epoch {epoch} step {counter}: " + " ".join(
                            f"{k}={v:.4f}" if abs(v) >= 5e-4 or v == 0
                            else f"{k}={v:.3g}"
                            for k, v in sorted(m.items())))
                if visualizer is not None and counter % args.vis_every == 0:
                    variables = {
                        "layout": {"params": state.gen_params["layout"],
                                   "batch_stats": state.gen_stats["layout"]},
                        "df": {"params": state.gen_params["df"]},
                        "vqvae": {"params": state.vqvae_params},
                    }
                    key, kv = jax.random.split(key)
                    p = visualizer(variables, batch, kv, counter)
                    if p:
                        print(f"[*] wrote sample visuals: {p}")
            dt = time.time() - t0
            print(f"[*] epoch {epoch} done in {dt:.1f}s "
                  f"({steps_done * cfg.batch.batch_size / dt:.2f} scenes/s, "
                  f"{steps_done}/{steps} steps)")
            # NOTE: the state is passed on-device — save_checkpoint fetches
            # it host-side sequentially in ≤64 MB chunks. A whole-tree
            # jax.device_get here wedges the tunneled-TPU relay (5.35 GB
            # concurrent gather; see checkpoints.fetch_tree_chunked).
            if (args.save_every > 0 and epoch % args.save_every == 0) \
                    or epoch == args.nepoch - 1:
                if v1_full:
                    from commonscenes_tpu.train.checkpoints import \
                        save_v1_checkpoint
                    save_v1_checkpoint(os.path.join(ckpt_dir,
                                                    f"model_{epoch}"),
                                       state, epoch=epoch)
                else:
                    save_checkpoint(os.path.join(ckpt_dir, f"model_{epoch}"),
                                    state, epoch=epoch)
                print(f"[*] saved model_{epoch}")
        logger.close()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
