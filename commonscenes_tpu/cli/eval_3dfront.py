"""Evaluation CLI — the reference ``scripts/eval_3dfront.py`` surface on the
TPU-native stack.

Pipeline parity (eval_3dfront.py:59-780):
1. load args.json + checkpoint;
2. collect train-set latent statistics (mean/cov of encoder means,
   model/VAE.py:160-191) with a pickle cache;
3. generation loop: sample boxes/angles (+ shapes with DDIM-100 CFG),
   denormalize, score scene-graph constraint accuracy (SCA);
4. manipulation loops (relationship / addition) scoring only changed nodes;
5. optional diversity: repeated shape resampling + chamfer;
6. exports: denormalized layouts (json) + SDF grids (npz) for the offline
   FID/KID and MMD/COV/1-NN tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", default="./experiments/layout_test")
    p.add_argument("--epoch", type=int, default=90)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--gen_shape", default=False,
                   type=lambda s: s.lower() in ("1", "true", "yes"))
    p.add_argument("--num_samples", type=int, default=3,
                   help="resamples for the diversity metric (0 = off)")
    p.add_argument("--evaluate_diversity", default=False,
                   type=lambda s: s.lower() in ("1", "true", "yes"))
    p.add_argument("--num_scenes", type=int, default=16)
    p.add_argument("--manipulation", default="none",
                   choices=["none", "relationship", "addition"])
    p.add_argument("--export_dir", default="")
    p.add_argument("--seed", type=int, default=47)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.cli.train_3dfront import build_config, build_parser as tp
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import (SyntheticDataset,
                                                 denormalize_boxes)
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.eval.constraints import (accuracy_summary,
                                                   validate_constraints)
    from commonscenes_tpu.eval.diversity import diversity_between_runs
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.models.layout_vae import LayoutVAE
    from commonscenes_tpu.train.checkpoints import restore_checkpoint
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    # restore training args (reference eval_3dfront.py:65-68)
    args_json = os.path.join(args.exp, "args.json")
    if os.path.exists(args_json):
        with open(args_json) as f:
            train_args_d = json.load(f)
        train_args = tp().parse_args([])
        for k, v in train_args_d.items():
            if hasattr(train_args, k):
                setattr(train_args, k, v)
    else:
        train_args = tp().parse_args([])
    cfg = build_config(train_args)
    with_shapes = train_args.network_type == "v2_full"
    use_clip = cfg.layout.use_clip

    if args.dataset == "synthetic":
        vocab = Vocab.synthetic()
        objs_range = (4, max(4, cfg.batch.max_objs - 2))
        train_set = SyntheticDataset(vocab, num_scenes=32,
                                     num_objs_range=objs_range,
                                     sdf_res=cfg.batch.sdf_res if with_shapes else 0,
                                     seed=0, with_clip=use_clip)
        test_set = SyntheticDataset(vocab, num_scenes=args.num_scenes,
                                    num_objs_range=objs_range,
                                    sdf_res=cfg.batch.sdf_res if with_shapes else 0,
                                    seed=1, with_clip=use_clip)
    else:
        from commonscenes_tpu.data.sgfront import SGFrontDataset
        train_set = SGFrontDataset(args.dataset, "train", args.room_type,
                                   use_sdf=with_shapes, with_clip=use_clip)
        test_set = SGFrontDataset(args.dataset, "test", args.room_type,
                                  use_sdf=with_shapes, with_clip=use_clip)
        vocab = train_set.vocab

    dtype = jnp.bfloat16 if getattr(train_args, "bf16", True) else None
    model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                               vocab.num_pred_classes, dtype=dtype)
    trainer = V2FullTrainer(cfg, model, with_shapes=with_shapes)

    rng = np.random.RandomState(args.seed)
    batch0 = collate([train_set[0], train_set[1 % len(train_set)]], vocab,
                     cfg.batch.__class__(
                         batch_size=2, max_objs=cfg.batch.max_objs,
                         max_triples=cfg.batch.max_triples,
                         diffusion_bs=cfg.batch.diffusion_bs,
                         sdf_res=cfg.batch.sdf_res),
                     rng, use_clip=use_clip, with_shapes=with_shapes)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    ckpt = os.path.join(args.exp, train_args.outf, f"model_{args.epoch}")
    if os.path.exists(ckpt):
        state, _ = restore_checkpoint(ckpt, state)
        print(f"[*] loaded {ckpt}")
    else:
        print(f"[!] checkpoint {ckpt} missing — evaluating random init")

    variables = {
        "layout": {"params": state.gen_params["layout"],
                   "batch_stats": state.gen_stats["layout"]},
        "df": {"params": state.gen_params["df"]} if state.gen_params.get("df") else None,
        "vqvae": {"params": state.vqvae_params} if state.vqvae_params else None,
    }

    # ---- train-set latent statistics (cached, VAE.py:160-191) ----
    stats_pkl = os.path.join(args.exp, f"model_stats_{args.epoch}.pkl")
    if os.path.exists(stats_pkl):
        with open(stats_pkl, "rb") as f:
            mean_est, cov_est = pickle.load(f)
    else:
        mus = []
        for i in range(min(len(train_set), 32)):
            b = collate([train_set[i]], vocab,
                        cfg.batch.__class__(batch_size=1,
                                            max_objs=cfg.batch.max_objs,
                                            max_triples=cfg.batch.max_triples,
                                            diffusion_bs=cfg.batch.diffusion_bs,
                                            sdf_res=cfg.batch.sdf_res),
                        rng, use_clip=use_clip)
            m, _ = model.encode_means(variables, b.enc)
            mus.append(m)
        mu_cat = np.concatenate(mus, 0)
        mean_est = mu_cat.mean(0)
        cov_est = np.cov((mu_cat - mean_est).T)
        with open(stats_pkl, "wb") as f:
            pickle.dump((mean_est, cov_est), f)
    cov_chol = np.linalg.cholesky(
        cov_est + 1e-5 * np.eye(cov_est.shape[0]))

    # ---- generation / manipulation loop ----
    accuracy = None
    run_sdfs = [[] for _ in range(max(args.num_samples, 1))]
    obj_classes_acc = []
    export = []
    key = jax.random.PRNGKey(args.seed)
    t_start = time.time()
    n_eval = min(args.num_scenes, len(test_set))
    manip = args.manipulation

    for i in range(n_eval):
        scene = test_set[i]
        b = collate([scene], vocab,
                    cfg.batch.__class__(batch_size=1,
                                        max_objs=cfg.batch.max_objs,
                                        max_triples=cfg.batch.max_triples,
                                        diffusion_bs=cfg.batch.diffusion_bs,
                                        sdf_res=cfg.batch.sdf_res),
                    rng, use_clip=use_clip,
                    manipulation_modes=(manip,),
                    with_shapes=False)
        key, sub = jax.random.split(key)

        # pack shape generation to real furniture slots (skip pad + root)
        objs_row = np.asarray(b.dec.objs).reshape(-1)
        mask_row = np.asarray(b.dec.obj_mask).reshape(-1) > 0
        slots = np.where(mask_row & (objs_row != vocab.scene_class_id))[0]
        K = cfg.batch.max_objs  # static bucket
        slots_padded = np.concatenate(
            [slots, np.zeros(K - len(slots), np.int64)])[:K].astype(np.int32)
        n_real = min(len(slots), K)

        if manip == "none":
            out = model.sample(variables, b.dec, jnp.asarray(mean_est),
                               jnp.asarray(cov_chol), sub,
                               gen_shape=args.gen_shape and with_shapes,
                               shape_slot_idx=jnp.asarray(slots_padded))
            keep = None
        else:
            # manipulation eval: encode GT, apply changes, decode
            lv_out = model.layout.apply(
                variables["layout"], b.enc, b.dec, b.node_new,
                b.node_changed, sub, train=False)
            out = {"boxes": lv_out["boxes"], "angles": lv_out["angles"],
                   "sdf": None}
            keep = np.asarray(b.keep_mask).reshape(-1)

        mask = np.asarray(b.dec.obj_mask).reshape(-1) > 0
        boxes_n = np.asarray(out["boxes"])
        boxes_d = denormalize_boxes(boxes_n)
        accuracy = validate_constraints(
            np.asarray(b.dec.triples), boxes_d, vocab.predicates,
            keep=keep, triple_mask=np.asarray(b.dec.triple_mask),
            changes_mode=(manip != "none"), accuracy=accuracy)

        if args.gen_shape and with_shapes and args.evaluate_diversity:
            for s_idx in range(args.num_samples):
                key, sub2 = jax.random.split(key)
                o = model.sample(variables, b.dec, jnp.asarray(mean_est),
                                 jnp.asarray(cov_chol), sub2, gen_shape=True,
                                 shape_slot_idx=jnp.asarray(slots_padded))
                run_sdfs[s_idx].append(np.asarray(o["sdf"])[:n_real])
            obj_classes_acc.append(objs_row[slots[:n_real]])

        if args.export_dir:
            os.makedirs(args.export_dir, exist_ok=True)
            export.append({"scan_id": scene.scan_id,
                           "objs": np.asarray(b.dec.objs).reshape(-1)[mask].tolist(),
                           "boxes": boxes_d[mask].tolist(),
                           "angles": np.asarray(out["angles"]).argmax(1)[mask].tolist()})
            # scene-graph figure (reference helpers/visualize_graph.py)
            from commonscenes_tpu.eval.graph_viz import export_dot
            export_dot(os.path.join(args.export_dir, f"{scene.scan_id}.dot"),
                       np.asarray(b.dec.objs[0]), np.asarray(b.dec.triples[0]),
                       vocab.obj_classes, vocab.predicates,
                       obj_mask=np.asarray(b.dec.obj_mask[0]),
                       triple_mask=np.asarray(b.dec.triple_mask[0]),
                       node_new=np.asarray(b.node_new[0]),
                       node_changed=np.asarray(b.node_changed[0]),
                       scene_class_id=vocab.scene_class_id)
            if out.get("sdf") is not None:
                sdfs_m = np.asarray(out["sdf"])[:n_real].astype(np.float32)
                np.savez_compressed(
                    os.path.join(args.export_dir, f"{scene.scan_id}_sdf.npz"),
                    sdf=sdfs_m, slots=slots[:n_real])
                # assembled scene mesh (reference render_v2_full glb export,
                # visualize_scene.py:378-461) as OBJ
                from commonscenes_tpu.eval.scene_export import (
                    angle_bin_to_degrees, export_obj, fit_vertices_to_box)
                from commonscenes_tpu.ops.mesh import marching_tetrahedra
                angs_all = np.asarray(out["angles"]).argmax(1)
                meshes, names = [], []
                for kk in range(sdfs_m.shape[0]):
                    slot = int(slots[kk])
                    vv, ff = marching_tetrahedra(sdfs_m[kk], level=0.02)
                    if len(ff) == 0:
                        continue
                    vv = fit_vertices_to_box(
                        vv, boxes_d[slot],
                        angle_deg=angle_bin_to_degrees(int(angs_all[slot])))
                    meshes.append((vv, ff))
                    cls = int(objs_row[slot])
                    names.append(f"{vocab.obj_classes[cls]}_{kk}")
                if meshes:
                    export_obj(os.path.join(args.export_dir,
                                            f"{scene.scan_id}.obj"),
                               meshes, names)

    dt = time.time() - t_start
    summary = accuracy_summary(accuracy) if accuracy else {}
    summary["scenes_per_sec"] = n_eval / dt

    if args.evaluate_diversity and any(len(r) for r in run_sdfs):
        runs = [np.concatenate(r, 0) for r in run_sdfs if r]
        classes = np.concatenate(obj_classes_acc, 0)
        summary.update(diversity_between_runs(runs, classes))

    if args.export_dir:
        os.makedirs(args.export_dir, exist_ok=True)
        with open(os.path.join(args.export_dir, "layouts.json"), "w") as f:
            json.dump(export, f)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in summary.items()}, indent=2))
    return summary


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
