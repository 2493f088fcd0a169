"""Evaluation CLI — the reference ``scripts/eval_3dfront.py`` surface on the
TPU-native stack.

Pipeline parity (eval_3dfront.py:59-780):
1. load args.json + checkpoint (all four network types, incl. v1_full with
   DeepSDF-latent retrieval, model/VAE.py:296-319);
2. collect train-set latent statistics over the FULL train split
   (model/VAE.py:160-191) with a pickle cache;
3. generation loop: sample boxes/angles (+ shapes with DDIM-100 CFG),
   denormalize with the dataset's per-split stats (helpers/util.py:536-562),
   score scene-graph constraint accuracy (SCA);
4. manipulation loops (relationship / addition) scoring only changed nodes,
   with shape regeneration (reference decoder_with_changes_boxes_and_shape,
   model/VAE.py:193-235);
5. optional diversity: repeated shape resampling + chamfer;
6. exports: denormalized layouts (json), SDF grids (npz), OBJ scene meshes
   and DOT graphs for the offline FID/KID and MMD/COV/1-NN tooling.

TPU redesign vs the reference's batch-1 python loop: scenes are evaluated in
jitted multi-scene batches with shape slots packed across the batch
(eval/sampling.py), sharded over a device mesh when the batch divides the
device count.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from functools import partial

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
    p.add_argument("--render_dir", default="",
                   help="write top-down PNGs of predicted scenes here (the "
                        "FID/KID fake set, camera-matched to "
                        "collect_gt_renders)")
    p.add_argument("--render_res", type=int, default=256)
    p.add_argument("--render_extent", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--out", default="",
                   help="write the summary report as valid JSON to this "
                        "file (stdout keeps the human-readable log)")
    p.add_argument("--sampler", default="ddim", choices=["ddim", "plms"],
                   help="shape sampler (the reference ships PLMS unwired)")
    p.add_argument("--staged_sample", default=True,
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   help="jit layout/denoise/decode as separate stages "
                        "(numerically identical; each stage compiles and "
                        "caches independently, so a dropped TPU tunnel "
                        "mid-compile resumes instead of starting over; "
                        "False = the single fused program bench.py times)")
    p.add_argument("--host_denoise", default=False,
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   help="drive the DDIM chain as a host loop over ONE "
                        "jitted step instead of a compiled scan (staged "
                        "mode only). The chain-as-one-program is a ~40 min "
                        "compile on the tunneled device — longer than the "
                        "tunnel's stable window, so it can never finish "
                        "there; one step compiles in minutes, persists to "
                        "the compile cache, and async dispatch keeps the "
                        "device busy. Numerically identical to the scan "
                        "(tests/test_ddim_host_loop.py)")
    # TPU-native batching knobs
    p.add_argument("--eval_batch", type=int, default=0,
                   help="scenes per jitted sampling call; 0 = auto "
                        "(one scene per device: B=1 on a single chip — "
                        "measured fastest per-chip — with the batch "
                        "dimension reserved for the device mesh)")
    p.add_argument("--pack_bucket", type=int, default=16,
                   help="shape-slot packing bucket (static DDIM batch)")
    p.add_argument("--shard_objects", default=False,
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   help="single-scene latency mode: process one scene per "
                        "call and shard its packed shape slots across the "
                        "device mesh (the reference instead runs slots "
                        "through a serial mini-batch-of-7 loop, "
                        "sdfusion_txt2shape_model.py:493-511)")
    p.add_argument("--stats_batch", type=int, default=16,
                   help="scenes per jitted latent-stats batch")
    p.add_argument("--cat_jid", default="",
                   help="reference cat_jid_trainval[_small].json for "
                        "box-variant mesh retrieval (helpers/util.py:88-92); "
                        "defaults to building the database from the dataset")
    p.add_argument("--future_model_dir", default="",
                   help="3D-FUTURE-model root holding <id>/raw_model.obj "
                        "(defaults to <dataset>/3D-FUTURE-model)")
    p.add_argument("--stats_limit", type=int, default=0,
                   help="cap train scenes for latent stats (0 = full split)")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. 'cpu'). The env var "
                        "JAX_PLATFORMS is consumed by the plugin before "
                        "this process can see it, so a tunneled-TPU parent "
                        "env can only be overridden in-process. Layout-only "
                        "eval (--gen_shape False) is perfectly serviceable "
                        "on the CPU backend when the tunnel is down — the "
                        "per-relation SCA table is computed from sampled "
                        "layouts alone (reference scripts/"
                        "eval_3dfront.py:764-780)")
    return p


def _batch_cfg(cfg, batch_size):
    import dataclasses
    return dataclasses.replace(cfg.batch, batch_size=batch_size)


def _export_scene(export_dir, scene, vocab, b, bi, boxes_d, angles_row,
                  sdfs=None, slot_rows=None, retrieved=None, box_retr=None,
                  render_dir=None, render_res=256, render_extent=8.0):
    """Per-scene exports: DOT graph, layout row, optional OBJ/NPZ meshes,
    and (with ``render_dir``) a top-down PNG of the predicted scene — the
    fake set for FID/KID, camera-matched to cli/collect_gt_renders.py
    (reference render pipeline: scripts/collect_gt_sdf_images.py:55-60)."""
    render_meshes, render_classes = [], []
    render_slots = set()    # scene slots already covered by a real mesh
    import jax  # noqa: F401  (kept lazy)
    from commonscenes_tpu.eval.graph_viz import export_dot
    N = b.dec.objs.shape[1]
    mask = np.asarray(b.dec.obj_mask[bi]) > 0
    objs_row = np.asarray(b.dec.objs[bi])
    export_dot(os.path.join(export_dir, f"{scene.scan_id}.dot"),
               objs_row, np.asarray(b.dec.triples[bi]),
               vocab.obj_classes, vocab.predicates,
               obj_mask=np.asarray(b.dec.obj_mask[bi]),
               triple_mask=np.asarray(b.dec.triple_mask[bi]),
               node_new=np.asarray(b.node_new[bi]),
               node_changed=np.asarray(b.node_changed[bi]),
               scene_class_id=vocab.scene_class_id)
    rec = {"scan_id": scene.scan_id,
           "root_class": int(vocab.scene_class_id),
           "objs": objs_row[mask].tolist(),
           "boxes": boxes_d[bi * N:(bi + 1) * N][mask].tolist(),
           "angles": angles_row[bi * N:(bi + 1) * N][mask].tolist()}
    if getattr(scene, "instance_ids", None) is not None:
        # slot → dataset instance id (consumed by cli/consistency_check.py
        # to translate the reference's instance-id pair lists)
        rec["instance_ids"] = np.asarray(scene.instance_ids).tolist()
    if retrieved is not None:
        rec["retrieved"] = retrieved
    if box_retr is not None:
        # box-variant mesh retrieval (reference get_textured_objects_v2,
        # helpers/util.py:86-138): nearest 3D-FUTURE model by box size,
        # placed by predicted yaw + translation
        from commonscenes_tpu.eval.scene_export import (DEFAULT_PALETTE,
                                                        angle_bin_to_degrees,
                                                        box_outline_mesh,
                                                        export_glb,
                                                        export_obj)
        sel = [j for j in range(N) if mask[j]]
        rows = boxes_d[bi * N:(bi + 1) * N]
        recs = box_retr.retrieve_scene(
            [vocab.obj_classes[int(objs_row[j])] for j in sel],
            rows[sel],
            [angle_bin_to_degrees(int(angles_row[bi * N + j]))
             for j in sel])
        rec["retrieved_boxmesh"] = {int(sel[r["slot"]]): r["model_id"]
                                    for r in recs}
        meshes = [r["mesh"] for r in recs if "mesh" in r]
        mnames = [f"{r['class']}_{sel[r['slot']]}"
                  for r in recs if "mesh" in r]
        cols = [DEFAULT_PALETTE[int(objs_row[sel[r["slot"]]])
                                % len(DEFAULT_PALETTE)]
                for r in recs if "mesh" in r]
        for r in recs:
            if "mesh" in r:  # renders exclude the bbox outlines (GT has none)
                render_meshes.append(r["mesh"])
                render_classes.append(int(objs_row[sel[r["slot"]]]))
                render_slots.add(int(sel[r["slot"]]))
        # bbox outline geometry per real slot — object-colored cylinder
        # edges like the reference render_boxes path
        # (helpers/visualize_scene.py:193-199: 12 cylinders, radius 0.02)
        for j in sel:
            if int(objs_row[j]) == vocab.scene_class_id:
                continue
            box7 = np.concatenate([rows[j],
                                   [angle_bin_to_degrees(
                                       int(angles_row[bi * N + j]))]])
            bv, bf = box_outline_mesh(box7)
            if len(bf):
                meshes.append((bv, bf))
                mnames.append(f"bbox_{j}")
                cols.append(DEFAULT_PALETTE[int(objs_row[j])
                                            % len(DEFAULT_PALETTE)])
        if meshes:
            export_obj(os.path.join(export_dir,
                                    f"{scene.scan_id}_retrieval.obj"),
                       meshes, mnames)
            # reference exports each scene as .glb too
            # (helpers/visualize_scene.py:256,359,443)
            export_glb(os.path.join(export_dir,
                                    f"{scene.scan_id}_retrieval.glb"),
                       meshes, mnames, colors=cols)
            # per-object OBJs with the reference's naming convention
            # {label}_{cat_id}_{instance_id}.obj (helpers/util.py:119)
            obj_dir = os.path.join(export_dir, f"{scene.scan_id}_objects")
            inst = 1
            for r in recs:
                if "mesh" not in r:
                    continue
                export_obj(os.path.join(
                    obj_dir, f"{r['class']}_{sel[r['slot']]}_{inst}.obj"),
                    [r["mesh"]], [r["class"]])
                inst += 1
    if sdfs is not None and slot_rows is not None and len(slot_rows):
        from commonscenes_tpu.eval.scene_export import (
            DEFAULT_PALETTE, angle_bin_to_degrees, export_glb, export_obj,
            fit_vertices_to_box)
        from commonscenes_tpu.ops.mesh import marching_tetrahedra
        np.savez_compressed(
            os.path.join(export_dir, f"{scene.scan_id}_sdf.npz"),
            sdf=sdfs.astype(np.float32), slots=np.asarray(slot_rows) % N)
        meshes, names, cols = [], [], []
        for kk, flat_slot in enumerate(slot_rows):
            slot = int(flat_slot) % N
            vv, ff = marching_tetrahedra(sdfs[kk], level=0.02)
            if len(ff) == 0:
                continue
            vv = fit_vertices_to_box(
                vv, boxes_d[bi * N + slot],
                angle_deg=angle_bin_to_degrees(
                    int(angles_row[bi * N + slot])))
            meshes.append((vv, ff))
            names.append(f"{vocab.obj_classes[int(objs_row[slot])]}_{kk}")
            cols.append(DEFAULT_PALETTE[int(objs_row[slot])
                                        % len(DEFAULT_PALETTE)])
            render_meshes.append((vv, ff))
            render_classes.append(int(objs_row[slot]))
            render_slots.add(slot)
        if meshes:
            export_obj(os.path.join(export_dir, f"{scene.scan_id}.obj"),
                       meshes, names)
            # reference exports each scene as .glb too
            # (helpers/visualize_scene.py:256,359,443)
            export_glb(os.path.join(export_dir, f"{scene.scan_id}.glb"),
                       meshes, names, colors=cols)
    if render_dir:
        from commonscenes_tpu.eval.scene_export import (angle_bin_to_degrees,
                                                        render_topdown,
                                                        save_png,
                                                        solid_box_mesh)
        # slots with no generated/retrieved mesh fall back to solid-box
        # proxies — the SAME fallback collect_gt_renders uses for the real
        # set, so FID compares layout quality, not mesh availability
        for j in range(N):
            if not mask[j] or int(objs_row[j]) == vocab.scene_class_id \
                    or j in render_slots:
                continue
            bv, bf = solid_box_mesh(
                boxes_d[bi * N + j],
                angle_deg=angle_bin_to_degrees(int(angles_row[bi * N + j])))
            render_meshes.append((bv, bf))
            render_classes.append(int(objs_row[j]))
        if render_meshes:
            os.makedirs(render_dir, exist_ok=True)
            img = render_topdown(render_meshes, render_classes,
                                 resolution=render_res, extent=render_extent)
            save_png(os.path.join(render_dir, f"{scene.scan_id}.png"), img)
    return rec


def main(argv=None):
    args = build_parser().parse_args(argv)
    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from commonscenes_tpu.cli.train_3dfront import build_config, build_parser as tp
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import (SyntheticDataset,
                                                 denormalize_boxes)
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.eval.constraints import (accuracy_summary,
                                                   validate_constraints)
    from commonscenes_tpu.eval.diversity import diversity_between_runs
    from commonscenes_tpu.eval.sampling import (collect_latent_stats,
                                                make_eval_mesh, pack_slots)
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
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
        train_args_d = {}
        train_args = tp().parse_args([])
    cfg = build_config(train_args)
    # imported reference checkpoints carry inferred layout dims that the
    # flag surface can't express (cli/import_checkpoint.py writes them)
    if isinstance(train_args_d.get("layout"), dict):
        import dataclasses
        cfg = cfg.replace(layout=dataclasses.replace(
            cfg.layout, **train_args_d["layout"]))
    net_type = train_args.network_type
    v1_full = net_type == "v1_full"
    with_shapes = net_type == "v2_full"
    use_clip = cfg.layout.use_clip and not v1_full

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

    # per-split denormalization stats (reference helpers/util.py:536-562 via
    # the split's boxes_centered_stats file — NOT hard-coded bedroom values)
    box_mean = getattr(test_set, "box_mean", None)
    box_std = getattr(test_set, "box_std", None)
    denorm = partial(denormalize_boxes, mean=box_mean, std=box_std)

    dtype = jnp.bfloat16 if getattr(train_args, "bf16", True) else None
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    slot_sharding = None
    if args.shard_objects and jax.device_count() > 1:
        # latency mode: one scene per call, its packed slots sharded
        from jax.sharding import NamedSharding, PartitionSpec
        from commonscenes_tpu.parallel.mesh import make_mesh
        B = 1
        mesh = make_mesh(jax.device_count())
        args.pack_bucket = mesh.devices.size
        slot_sharding = NamedSharding(mesh, PartitionSpec("data"))
        print(f"[*] object-sharded sampling over {mesh.devices.size} "
              f"devices (one scene per call)")
    elif args.eval_batch > 0:
        B = args.eval_batch
        mesh = make_eval_mesh(B)
    else:
        # auto: one scene per device. Per-chip, B=1 sampling measures
        # fastest (BENCH r3: 0.1500 single vs 0.1471/scene at B=2 on one
        # chip); the batch dimension exists to shard scenes over a mesh.
        B = max(1, jax.device_count())
        print(f"[*] eval_batch auto-selected: {B} "
              f"({jax.device_count()} device(s))")
        mesh = make_eval_mesh(B)
    if mesh is not None and slot_sharding is None:
        print(f"[*] eval sharded over {mesh.devices.size} devices")

    # ------------------------------------------------------------------
    # build model + restore checkpoint
    # ------------------------------------------------------------------
    batch0 = collate([train_set[i % len(train_set)] for i in range(B)],
                     vocab, _batch_cfg(cfg, B), rng, use_clip=use_clip,
                     with_shapes=with_shapes)
    ckpt = os.path.join(args.exp, train_args.outf, f"model_{args.epoch}")

    def _np_template(abstract_state):
        # numpy zeros (calloc — no physical pages until touched) make
        # orbax restore HOST-side: the tunneled device never sees the
        # optimizer moments, which eval doesn't use and which are ~2/3
        # of the 4.5 GB train checkpoint
        return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                            abstract_state)

    def _device_put_sequential(tree, label):
        """Upload a pytree one leaf at a time.

        The tunneled relay wedges on large CONCURRENT transfers
        (PERFORMANCE.md, tunneled-transport rules) while sequential
        ≤64 MB moves are reliable at any volume — so the eval weights
        go up leaf-by-leaf, with a progress line for the watchdog."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        total = sum(getattr(x, "nbytes", 0) for x in leaves) / 2 ** 20
        print(f"[*] uploading {label}: {len(leaves)} leaves, "
              f"{total:.0f} MiB", flush=True)
        out = []
        done = 0.0
        for x in leaves:
            y = jax.device_put(x)
            jax.block_until_ready(y)
            out.append(y)
            done += getattr(x, "nbytes", 0) / 2 ** 20
            if leaves and done and int(done) // 512 != \
                    int(done - getattr(x, "nbytes", 0) / 2 ** 20) // 512:
                print(f"[*]   ... {done:.0f}/{total:.0f} MiB", flush=True)
        return jax.tree_util.tree_unflatten(treedef, out)

    if v1_full:
        from commonscenes_tpu.models.v1_full import (ShapeRetrieval,
                                                     V1FullVAE,
                                                     pseudo_shape_codes)
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
        codes0 = jnp.asarray(pseudo_shape_codes(
            np.asarray(batch0.dec.objs), dim=cfg.layout.shape_input_dim))
        if os.path.exists(ckpt):
            from commonscenes_tpu.train.checkpoints import \
                restore_v1_checkpoint
            # the checkpoint overwrites every state leaf, so a traced
            # eval_shape skeleton is template enough for orbax — skips
            # the on-device random-init compile (minutes per retry on
            # the tunneled device)
            state = _np_template(jax.eval_shape(
                trainer.init_state, jax.random.PRNGKey(0), batch0, codes0))
            state, _ = restore_v1_checkpoint(ckpt, state)
            print(f"[*] loaded {ckpt}")
        else:
            state = trainer.init_state(jax.random.PRNGKey(0), batch0,
                                       codes0)
            print(f"[!] checkpoint {ckpt} missing — evaluating random init")
        variables = _device_put_sequential(
            {"params": state.params, "batch_stats": state.stats},
            "v1 eval weights")

        # retrieval database (reference model/VAE.py:29-46): real DeepSDF
        # codes when the dataset ships them, else per-class pseudo-codes.
        # Candidates are restricted per class like the reference's
        # box_data[class_name] lookup (decode_g2sv1, VAE.py:296-319).
        deepsdf_root = os.path.join(args.dataset, "DEEPSDF_reconstruction") \
            if args.dataset != "synthetic" else ""
        if deepsdf_root and os.path.isdir(os.path.join(deepsdf_root, "Codes")):
            retrieval = ShapeRetrieval.from_deepsdf_dir(deepsdf_root)
            retrieval.class_to_ids = getattr(
                train_set, "model_ids_by_class", lambda: {})()
            mesh_base = os.path.join(deepsdf_root, "Meshes")
        else:
            retrieval = ShapeRetrieval(
                {f"class_{c}": pseudo_shape_codes(
                    np.asarray([c]), dim=cfg.layout.shape_input_dim)[0]
                 for c in range(vocab.num_obj_classes)},
                class_to_ids={vocab.obj_classes[c]: [f"class_{c}"]
                              for c in range(vocab.num_obj_classes)})
            mesh_base = ""
    else:
        model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                                   vocab.num_pred_classes, dtype=dtype)
        trainer = V2FullTrainer(cfg, model, with_shapes=with_shapes)
        if os.path.exists(ckpt):
            # abstract template: every leaf is overwritten by the
            # restore, so eval_shape (pure tracing) replaces the
            # minutes-long on-device random-init compile
            state = _np_template(jax.eval_shape(
                trainer.init_state, jax.random.PRNGKey(0), batch0))
            state, _ = restore_checkpoint(ckpt, state)
            print(f"[*] loaded {ckpt}")
        else:
            state = trainer.init_state(jax.random.PRNGKey(0), batch0)
            print(f"[!] checkpoint {ckpt} missing — evaluating random init")
        variables = _device_put_sequential({
            "layout": {"params": state.gen_params["layout"],
                       "batch_stats": state.gen_stats["layout"]},
            "df": {"params": state.gen_params["df"]} if state.gen_params.get("df") else None,
            "vqvae": {"params": state.vqvae_params} if state.vqvae_params else None,
        }, "eval weights")

    # ------------------------------------------------------------------
    # train-set latent statistics over the FULL split (cached;
    # reference VAE.py:160-191)
    # ------------------------------------------------------------------
    stats_pkl = os.path.join(args.exp, f"model_stats_{args.epoch}.pkl")
    # cache validated against everything the statistics depend on — a
    # changed dataset/room/limit recomputes instead of silently reusing
    stats_key = {"epoch": args.epoch, "room": args.room_type,
                 "dataset": args.dataset,
                 "stats_limit": int(args.stats_limit or 0),
                 "n_train": len(train_set)}
    mean_est = None
    if os.path.exists(stats_pkl):
        with open(stats_pkl, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and payload.get("key") == stats_key:
            mean_est, cov_est = payload["mean"], payload["cov"]
            stats_scenes = payload["scenes"]
        else:
            print("[!] cached latent stats don't match the current "
                  "(dataset, room, stats_limit) — recomputing")
    if mean_est is None:
        # weights as jit ARGUMENTS (see _vjit below for why closures
        # over params are poison on the tunneled device)
        if v1_full:
            @jax.jit
            def _enc_v1(v, enc, codes):
                mu, _ = model.apply(v, enc, codes, train=False,
                                    method=V1FullVAE.encode)
                return mu

            def encode_fn(enc):
                codes = jnp.asarray(pseudo_shape_codes(
                    np.asarray(enc.objs), dim=cfg.layout.shape_input_dim))
                return _enc_v1(variables, enc, codes)
        else:
            from commonscenes_tpu.models.layout_vae import LayoutVAE

            @jax.jit
            def _enc(v, enc):
                mu, _ = model.layout.apply(v, enc, train=False,
                                           method=LayoutVAE.encode)
                return mu

            def encode_fn(enc):
                return _enc(variables["layout"], enc)
        mean_est, cov_est = collect_latent_stats(
            encode_fn, train_set, vocab, cfg.batch, rng, use_clip,
            batch_size=args.stats_batch,
            limit=args.stats_limit or None)
        stats_scenes = min(args.stats_limit or len(train_set), len(train_set))
        with open(stats_pkl, "wb") as f:
            pickle.dump({"key": stats_key, "mean": mean_est,
                         "cov": cov_est, "scenes": stats_scenes}, f)
    cov_chol = np.linalg.cholesky(
        cov_est + 1e-5 * np.eye(cov_est.shape[0]))
    mean_j = jnp.asarray(mean_est)
    chol_j = jnp.asarray(cov_chol)

    # ------------------------------------------------------------------
    # jitted samplers (compiled once per packed-slot bucket K)
    # ------------------------------------------------------------------
    gen_shapes = bool(args.gen_shape and with_shapes)

    def _vjit(f, **jit_kw):
        """jit with the weights as a real ARGUMENT, not a closure.

        jax 0.9 embeds closed-over arrays in the HLO as literal constants:
        a jit that closes over the v2_full weights ships the entire UNet
        inside every remote-compile RPC (~116 MB observed on the tunneled
        device — longer than the tunnel's stable window, the direct cause
        of the round-5 denoise-step compile deaths) and keys the
        persistent compile cache on the weight VALUES, so a new checkpoint
        recompiles everything. As an argument the weights stay device-
        resident (passed by reference at dispatch) and the HLO is KBs."""
        jf = jax.jit(f, **jit_kw)
        return lambda *a, **kw: jf(variables, *a, **kw)

    if not v1_full and args.staged_sample:
        # Staged sampling: layout / denoise / decode as SEPARATE jits.
        # Numerically identical to the fused model.sample program (same
        # key splits, same ops — models/commonscenes.py sample_layout),
        # but each stage compiles and persists to the compile cache on its
        # own: the fused program is a single ~40-minute compile on the
        # tunneled device, longer than the tunnel's observed stable window,
        # so a mid-compile drop used to lose everything. The manipulation
        # path reuses the SAME denoise/decode executables.
        def _staged(name, f):
            state = {"new": True}

            def g(*a):
                if state["new"]:
                    t0 = time.time()
                    print(f"[*] compiling {name} stage...", flush=True)
                    r = f(*a)
                    jax.block_until_ready(r)
                    print(f"[*] {name} stage ready "
                          f"({time.time() - t0:.0f}s)", flush=True)
                    state["new"] = False
                    return r
                return f(*a)
            return g

        lay_fn = _staged("layout", _vjit(
            lambda v, dec, k: model.sample_layout(v, dec, mean_j,
                                                  chol_j, k)))
        mlay_fn = _staged("manip-layout", _vjit(
            lambda v, batch, k: model.manipulate_layout(v, batch, k)))
        if args.host_denoise and args.sampler == "ddim":
            # host-driven chain: jit ONE step, loop S times from the host
            # (idx is data → one executable for every step). Survives the
            # flaky tunnel: worst case a drop loses one step's dispatch,
            # and every retry resumes from the compile cache.
            prep_fn = _staged("denoise-prep", _vjit(
                lambda v, uc, c, k, slots: model.denoise_prep(
                    v, uc, c, k, shape_slot_idx=slots,
                    slot_sharding=slot_sharding)))
            step_fn = _staged("denoise-step", _vjit(
                lambda v, x, key, i, cin, ucin: model.denoise_step(
                    v, x, key, i, cin, ucin,
                    slot_sharding=slot_sharding)))
            n_steps = int(np.asarray(model.ddim_tables.timesteps).shape[0])

            def lat_fn(uc, c, k, slots):
                x, cin, ucin, key = prep_fn(uc, c, k, slots)
                for i in range(n_steps):
                    x, key = step_fn(x, key, np.int32(i), cin, ucin)
                return x
        else:
            if args.host_denoise:
                print("[!] --host_denoise supports the ddim sampler only; "
                      "using the compiled chain", flush=True)
            lat_fn = _staged("denoise", _vjit(
                lambda v, uc, c, k, slots: model.gen_latents(
                    v, uc, c, k, shape_slot_idx=slots,
                    sampler=args.sampler, slot_sharding=slot_sharding)))
        dec_fn = _staged("decode", _vjit(
            lambda v, s: model.decode_latents(v, s,
                                              slot_sharding=slot_sharding)))

        def sample_fn(dec, k, slots, gen):
            k_z, k_noise = jax.random.split(k)
            lay = lay_fn(dec, k_z)
            out = {"boxes": lay["boxes"], "angles": lay["angles"],
                   "z": lay["z"], "sdf": None}
            if gen:
                lat = lat_fn(lay["uc_rel"], lay["c_rel"], k_noise, slots)
                out["sdf"] = dec_fn(lat)
            return out

        def manip_fn(batch, k, slots, gen):
            k_l, k_noise = jax.random.split(k)
            lay = mlay_fn(batch, k_l)
            out = {"boxes": lay["boxes"], "angles": lay["angles"],
                   "keep": batch.keep_mask.reshape(-1), "sdf": None}
            if gen:
                lat = lat_fn(lay["uc_rel"], lay["c_rel"], k_noise, slots)
                out["sdf"] = dec_fn(lat)
            return out
    elif not v1_full:
        sample_fn = _vjit(
            lambda v, dec, k, slots, gen: model.sample(
                v, dec, mean_j, chol_j, k, gen_shape=gen,
                shape_slot_idx=slots, sampler=args.sampler,
                slot_sharding=slot_sharding),
            static_argnames=("gen",))
        manip_fn = _vjit(
            lambda v, batch, k, slots, gen: model.manipulate_sample(
                v, batch, k, gen_shape=gen, shape_slot_idx=slots,
                sampler=args.sampler),
            static_argnames=("gen",))
    else:
        from commonscenes_tpu.models.v1_full import V1FullVAE as _V1

        def _v1_sample(v, dec, k):
            BN = dec.objs.shape[0] * dec.objs.shape[1]
            eps = jax.random.normal(k, (BN, mean_j.shape[0]))
            z = mean_j[None, :] + eps @ chol_j.T
            boxes, angles, shapes = model.apply(
                v, z, dec, train=False, method=_V1.decode)
            return {"boxes": boxes, "angles": angles, "shapes": shapes}

        def _v1_manip(v, batch, codes, k):
            # reference decoder_with_changes for v1_full (VAE.py:195-197):
            # encode the GT encoder view, run the manipulation GCN, decode
            out = model.apply(v, batch.enc, batch.dec, codes,
                              batch.node_new, batch.node_changed, k,
                              train=False)
            return {"boxes": out["boxes"], "angles": out["angles"],
                    "shapes": out["shapes"],
                    "keep": batch.keep_mask.reshape(-1)}

        v1_sample_fn = _vjit(_v1_sample)
        v1_manip_fn = _vjit(_v1_manip)

    # ------------------------------------------------------------------
    # evaluation loop (batched; reference validate_constrains_loop[_w_changes])
    # ------------------------------------------------------------------
    accuracy = None
    run_sdfs = [[] for _ in range(max(args.num_samples, 1))]
    run_boxes = [[] for _ in range(max(args.num_samples, 1))]
    run_angles = [[] for _ in range(max(args.num_samples, 1))]
    obj_classes_acc = []
    export = []
    manip = args.manipulation
    n_eval = min(args.num_scenes, len(test_set))
    if args.export_dir:
        os.makedirs(args.export_dir, exist_ok=True)

    # box-variant mesh retrieval database (reference render_v2_box path,
    # visualize_scene.py:273-298) — only for the box-only model variants
    box_retr = None
    if args.export_dir and net_type in ("v1_box", "v2_box"):
        from commonscenes_tpu.eval.box_retrieval import BoxRetrieval
        model_base = args.future_model_dir or (
            os.path.join(args.dataset, "3D-FUTURE-model")
            if args.dataset != "synthetic" else "")
        if args.cat_jid:
            box_retr = BoxRetrieval.from_cat_jid(args.cat_jid, model_base)
        elif args.dataset != "synthetic":
            box_retr = BoxRetrieval.from_dataset(train_set, model_base)
        if box_retr is not None:
            n_models = sum(len(v) for v in box_retr.db.values())
            print(f"[*] box-retrieval database: {len(box_retr.db)} classes, "
                  f"{n_models} models")

    t_start = time.time()
    scenes_done = 0
    from contextlib import nullcontext
    ctx = mesh if mesh is not None else nullcontext()
    with ctx:
        for start in range(0, n_eval, B):
            idx = [min(i, n_eval - 1) for i in range(start, start + B)]
            n_valid = min(B, n_eval - start)
            scenes = [test_set[i] for i in idx]
            b = collate(scenes, vocab, _batch_cfg(cfg, B), rng,
                        use_clip=use_clip, manipulation_modes=(manip,),
                        with_shapes=False)
            # ragged tail: the duplicated filler rows get NO packed shape
            # slots, so the dominant per-slot diffusion cost scales with
            # n_valid instead of B (their layout decode is negligible)
            row_valid = (np.arange(B) < n_valid).astype(
                b.dec.obj_mask.dtype)
            slots, n_real = pack_slots(
                b.dec.objs, b.dec.obj_mask * row_valid[:, None],
                vocab.scene_class_id, bucket=args.pack_bucket)
            slots_j = jnp.asarray(slots)
            if mesh is not None:
                from commonscenes_tpu.parallel.mesh import shard_batch
                b = shard_batch(mesh, b)
            key, sub = jax.random.split(key)

            if v1_full and manip != "none":
                codes = jnp.asarray(pseudo_shape_codes(
                    np.asarray(b.dec.objs), dim=cfg.layout.shape_input_dim))
                out = v1_manip_fn(b, codes, sub)
                keep = np.asarray(out["keep"])
            elif v1_full:
                out = v1_sample_fn(b.dec, sub)
                keep = None
            elif manip == "none":
                out = sample_fn(b.dec, sub, slots_j, gen_shapes)
                keep = None
            else:
                out = manip_fn(b, sub, slots_j, gen_shapes)
                keep = np.asarray(out["keep"])

            boxes_d = denorm(np.asarray(out["boxes"], np.float32))
            angles_row = np.asarray(out["angles"]).argmax(1)

            # SCA per scene (only valid rows of the last ragged batch)
            for bi in range(n_valid):
                N = cfg.batch.max_objs
                sl = slice(bi * N, (bi + 1) * N)
                accuracy = validate_constraints(
                    np.asarray(b.dec.triples[bi]),
                    boxes_d[sl],
                    vocab.predicates,
                    keep=keep[sl] if keep is not None else None,
                    triple_mask=np.asarray(b.dec.triple_mask[bi])[None],
                    changes_mode=(manip != "none"), accuracy=accuracy)

            sdf_np = None
            if out.get("sdf") is not None:
                sdf_np = np.asarray(out["sdf"], np.float32)[..., 0] \
                    if np.asarray(out["sdf"]).ndim == 5 else \
                    np.asarray(out["sdf"], np.float32)

            # diversity resampling (reference eval_3dfront.py:584-719).
            # Box + angle spread needs only re-sampled LAYOUTS
            # (eval_3dfront.py:66-90, report :759-762), so it runs in
            # layout-only mode too; the chamfer shape-diversity term
            # additionally needs generated SDFs.
            if args.evaluate_diversity and not v1_full and manip == "none":
                # drop the duplicated tail scenes of the last ragged batch
                N = cfg.batch.max_objs
                valid_sel = np.where(
                    slots[:n_real] // N < n_valid)[0]
                obj_sel = np.where((np.asarray(b.dec.obj_mask)
                                    * row_valid[:, None]).reshape(-1) > 0)[0]
                for s_idx in range(args.num_samples):
                    key, sub2 = jax.random.split(key)
                    o = sample_fn(b.dec, sub2, slots_j, gen_shapes)
                    if gen_shapes:
                        sd = np.asarray(o["sdf"], np.float32)[..., 0]
                        run_sdfs[s_idx].append(sd[:n_real][valid_sel])
                    run_boxes[s_idx].append(
                        denorm(np.asarray(o["boxes"], np.float32))[obj_sel])
                    run_angles[s_idx].append(
                        np.asarray(o["angles"]).argmax(1)[obj_sel]
                        / 24.0 * 360.0)
                if gen_shapes:
                    objs_flat = np.asarray(b.dec.objs).reshape(-1)
                    obj_classes_acc.append(
                        objs_flat[slots[:n_real]][valid_sel])

            # retrieval for v1_full (reference decode_g2sv1, VAE.py:296-319)
            retrieved_all = None
            if v1_full:
                shapes_pred = np.asarray(out["shapes"], np.float32)
                objs_flat = np.asarray(b.dec.objs).reshape(-1)
                names = [vocab.obj_classes[int(c)] for c in
                         objs_flat[slots[:n_real]]]
                ids = retrieval.lookup(shapes_pred[slots[:n_real]], names)
                retrieved_all = dict(zip([int(s) for s in slots[:n_real]], ids))

            if args.export_dir:
                N = cfg.batch.max_objs
                for bi in range(n_valid):
                    slot_rows = [s for s in slots[:n_real]
                                 if s // N == bi] if n_real else []
                    sd_rows = None
                    if sdf_np is not None and slot_rows:
                        sel = [int(np.where(slots[:n_real] == s)[0][0])
                               for s in slot_rows]
                        sd_rows = sdf_np[sel]
                    retr = None
                    if retrieved_all is not None:
                        retr = {int(s) % N: retrieved_all[int(s)]
                                for s in slot_rows if int(s) in retrieved_all}
                    export.append(_export_scene(
                        args.export_dir, scenes[bi], vocab, b, bi, boxes_d,
                        angles_row, sdfs=sd_rows, slot_rows=slot_rows,
                        retrieved=retr, box_retr=box_retr,
                        render_dir=args.render_dir,
                        render_res=args.render_res,
                        render_extent=args.render_extent))
            scenes_done += n_valid

    dt = time.time() - t_start
    summary = accuracy_summary(accuracy) if accuracy else {}
    summary["scenes_per_sec"] = scenes_done / dt
    summary["eval_batch"] = B
    summary["network_type"] = net_type
    summary["latent_stats_scenes"] = stats_scenes

    if args.evaluate_diversity and any(len(r) for r in run_sdfs):
        runs = [np.concatenate(r, 0) for r in run_sdfs if r]
        classes = np.concatenate(obj_classes_acc, 0)
        summary.update(diversity_between_runs(runs, classes))
    if args.evaluate_diversity and any(len(r) for r in run_boxes):
        from commonscenes_tpu.eval.diversity import box_angle_diversity
        summary.update(box_angle_diversity(
            [np.concatenate(r, 0) for r in run_boxes if r],
            [np.concatenate(r, 0) for r in run_angles if r]))

    if args.export_dir:
        with open(os.path.join(args.export_dir, "layouts.json"), "w") as f:
            json.dump(export, f)

    report = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in summary.items()}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return summary



if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
