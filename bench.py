"""Benchmark: v2_full scene generation throughput (DDIM-100 with CFG).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference eval hot loop (scripts/eval_3dfront.py:444 →
VAEGAN_V2FULL.sample:600 → rel2shape → DDIMSampler 100 steps, CFG scale 3,
per-object shape generation): one "scene" = layout decode + relation
encoding + full-size SDFusion shape diffusion for its objects + VQ-VAE
decode to 64³ SDF grids.

Baseline: the reference publishes no numbers (BASELINE.json.published = {}),
so vs_baseline is computed against an analytic A100 estimate: the sampling
workload's FLOPs (analytic count, utils/flops.py) divided by a *generous*
A100 effective throughput of 25 TFLOPS — torch conv3d with TF32 tensor
cores at high utilization (the reference runs fp32 modules,
openai_model_3d.py:736-750's fp16 path is never invoked; TF32 is torch's
default conv path on A100). Measured v5e-8 projection = single-chip
throughput × 8 (data-parallel scene sharding; no cross-chip traffic in the
sampling loop).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_EFFECTIVE_FLOPS = 25.0e12   # torch TF32 conv3d, generous utilization
TPU_V5E_PEAK_BF16 = 197e12


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the heavy UNet/VQ-VAE programs compile
    # once per container; subsequent bench runs start in seconds
    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from commonscenes_tpu.core.config import FullConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import make_scene
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full

    vocab = Vocab.synthetic()
    cfg = FullConfig()  # full reference operating point (224ch UNet, 64^3 VQVAE)
    if os.environ.get("BENCH_UNET_REMAT", "1") == "0":
        import dataclasses
        cfg = cfg.replace(unet=dataclasses.replace(cfg.unet,
                                                   use_checkpoint=False))
    objs_per_scene = 8
    scenes_per_batch = int(os.environ.get("BENCH_SCENES", "1"))
    cfg = cfg.replace(batch=cfg.batch.__class__(
        batch_size=scenes_per_batch, max_objs=objs_per_scene + 1,
        max_triples=96, diffusion_bs=4, sdf_res=64))

    model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                               vocab.num_pred_classes,
                               dtype=jnp.bfloat16)

    ddim_steps = int(os.environ.get("BENCH_DDIM_STEPS", "0"))
    if ddim_steps:
        cfg = cfg.replace(diffusion=cfg.diffusion.__class__(
            ddim_steps=ddim_steps))
        model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                                   vocab.num_pred_classes,
                                   dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    scenes = [make_scene(vocab, rng, num_objs=objs_per_scene, sdf_res=64)
              for _ in range(scenes_per_batch)]
    batch = collate(scenes, vocab, cfg.batch, rng, with_shapes=True)
    print("initializing params (jitted)...", file=sys.stderr, flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    print("init done", file=sys.stderr, flush=True)

    dz = cfg.layout.embedding_dim
    mean_est = jnp.zeros((dz,))
    cov_chol = jnp.eye(dz) * 0.5

    # the SAME program the eval CLI runs: shape generation packed to the
    # real furniture slots (skips padded/root slots), eval/sampling.pack_slots
    from commonscenes_tpu.eval.sampling import pack_slots
    slots, n_real = pack_slots(batch.dec.objs, batch.dec.obj_mask,
                               vocab.scene_class_id, bucket=8)
    slots_j = jnp.asarray(slots)

    def sample_fn(variables, dec, key):
        out = model.sample(variables, dec, mean_est, cov_chol, key,
                           gen_shape=True, shape_slot_idx=slots_j)
        return out["boxes"], out["angles"], out["sdf"]

    jitted = jax.jit(sample_fn)

    print("compiling sample fn...", file=sys.stderr, flush=True)
    from commonscenes_tpu.utils.flops import sample_flops
    # naive-CFG count = the reference's program (baseline denominator);
    # dedup count = FLOPs actually executed (MFU numerator)
    flops = sample_flops(cfg.unet, cfg.vqvae,
                         num_objs=int(slots.shape[0]),
                         ddim_steps=cfg.diffusion.ddim_steps)
    # the CFG-dedup prefix only engages for crossattn conditioning
    # (models/commonscenes.py _gen_shapes); concat runs the naive program
    dedup = cfg.diffusion.conditioning_key == "crossattn"
    flops_exec = sample_flops(
        cfg.unet, cfg.vqvae, num_objs=int(slots.shape[0]),
        ddim_steps=cfg.diffusion.ddim_steps, cfg_dedup=dedup,
        # the M==1 cross-attention shortcut executes on the crossattn path
        # (one relation token per shape) — count what actually ran
        m1_cross=dedup,
        upsample_parity=os.environ.get("COMMONSCENES_UPSAMPLE",
                                       "parity") != "naive")

    def fetch(out):
        # host-fetch a scalar that depends on the last-produced buffer: over
        # the tunneled device, block_until_ready can ack before compute
        # finishes (measured: an 8192^3 matmul "completing" in 0.03 ms), and
        # identical repeated calls are deduped — distinct keys + a real
        # host read make the timing honest
        return float(np.asarray(jnp.sum(out[2][..., -1, 0])))

    # warmup call does the trace+compile (an explicit AOT
    # .lower().compile() would NOT seed jax.jit's dispatch cache — the
    # warmup would re-trace the whole 100-step program a second time)
    out = jitted(variables, batch.dec, jax.random.PRNGKey(1))
    fetch(out)
    print("compile done", file=sys.stderr, flush=True)

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    iter_times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = jitted(variables, batch.dec, jax.random.PRNGKey(2 + i))
        fetch(out)
        iter_times.append(time.perf_counter() - t0)
    dt = sum(iter_times)

    scenes_done = iters * scenes_per_batch
    scenes_per_sec = scenes_done / dt
    # worst-iter throughput: the spread the headline number must be quoted
    # with (public claims are pinned to driver artifacts, VERDICT r3 #3)
    scenes_per_sec_min = scenes_per_batch / max(iter_times)
    steps_per_sec = iters * cfg.diffusion.ddim_steps / dt

    # batched multi-scene eval pipeline (BASELINE config #5): B scenes per
    # jitted call, slots packed across the batch. BENCH_EVAL_SCENES=0 skips.
    eval_scenes_per_sec = None
    eval_batch = int(os.environ.get("BENCH_EVAL_SCENES", "2"))
    if eval_batch > 1:
        cfg_b = cfg.replace(batch=cfg.batch.__class__(
            batch_size=eval_batch, max_objs=objs_per_scene + 1,
            max_triples=96, diffusion_bs=4, sdf_res=64))
        scenes_b = [make_scene(vocab, rng, num_objs=objs_per_scene,
                               sdf_res=64) for _ in range(eval_batch)]
        batch_b = collate(scenes_b, vocab, cfg_b.batch, rng, with_shapes=True)
        slots_b, _ = pack_slots(batch_b.dec.objs, batch_b.dec.obj_mask,
                                vocab.scene_class_id, bucket=8)
        slots_bj = jnp.asarray(slots_b)

        def sample_b(variables, dec, key):
            out = model.sample(variables, dec, mean_est, cov_chol, key,
                               gen_shape=True, shape_slot_idx=slots_bj)
            return out["boxes"], out["angles"], out["sdf"]

        jit_b = jax.jit(sample_b)
        print(f"compiling batched eval (B={eval_batch})...", file=sys.stderr,
              flush=True)
        o = jit_b(variables, batch_b.dec, jax.random.PRNGKey(1))
        fetch(o)
        t0 = time.perf_counter()
        for i in range(iters):
            o = jit_b(variables, batch_b.dec, jax.random.PRNGKey(5 + i))
            fetch(o)
        eval_scenes_per_sec = iters * eval_batch / (time.perf_counter() - t0)

    # training-step throughput at the real training operating point
    # (batch 8, reference train loop scripts/train_3dfront.py:271-448);
    # default on, BENCH_TRAIN=0 skips
    train_scenes_per_sec = None
    train_batch = int(os.environ.get("BENCH_TRAIN", "8"))
    if train_batch > 0:
        from commonscenes_tpu.train.step_v2full import V2FullTrainer
        cfg_t = cfg.replace(batch=cfg.batch.__class__(
            batch_size=train_batch, max_objs=objs_per_scene + 1,
            max_triples=96, diffusion_bs=4, sdf_res=64))
        model_t = CommonScenesV2Full(cfg_t, vocab.num_obj_classes,
                                     vocab.num_pred_classes,
                                     dtype=jnp.bfloat16)
        trainer = V2FullTrainer(cfg_t, model_t, with_shapes=True)
        scenes_t = [make_scene(vocab, rng, num_objs=objs_per_scene,
                               sdf_res=64) for _ in range(train_batch)]
        tb = jax.device_put(
            collate(scenes_t, vocab, cfg_t.batch, rng, with_shapes=True))
        print(f"compiling train step (B={train_batch})...", file=sys.stderr,
              flush=True)
        def fetch_state(st):
            # the fetched scalar must depend on the LAST-produced buffers —
            # the DISCRIMINATOR update runs after the generator one in
            # train_step, so fetch a leaf of each; an upstream loss metric
            # (or gen-only leaf) could ack before the disc tail runs
            leaves = [jax.tree.leaves(st.gen_params)[-1]]
            if jax.tree.leaves(st.disc_params):
                leaves.append(jax.tree.leaves(st.disc_params)[-1])
            return float(sum(np.asarray(jnp.sum(l.astype(jnp.float32)))
                             for l in leaves))

        state = trainer.init_state(jax.random.PRNGKey(0), tb)
        state, m = trainer.train_step(state, tb, jax.random.PRNGKey(99))
        fetch_state(state)
        t0 = time.perf_counter()
        for i in range(5):
            state, m = trainer.train_step(state, tb, jax.random.PRNGKey(i))
            fetch_state(state)
        train_scenes_per_sec = 5 * train_batch / (time.perf_counter() - t0)

    baseline_scenes_per_sec = A100_EFFECTIVE_FLOPS / (flops / scenes_per_batch)
    vs_baseline = scenes_per_sec / baseline_scenes_per_sec
    achieved_flops = flops_exec * iters / dt

    print(json.dumps({
        "metric": "scenes/sec/chip (v2_full DDIM-100 CFG, 8 objs/scene)",
        "value": round(scenes_per_sec, 5),
        "unit": "scenes/sec",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {
            "denoise_steps_per_sec": round(steps_per_sec, 3),
            "scenes_per_sec_min": round(scenes_per_sec_min, 5),
            "iter_times_s": [round(t, 3) for t in iter_times],
            "sample_tflops_per_scene": round(flops / scenes_per_batch / 1e12, 1),
            "achieved_tflops": round(achieved_flops / 1e12, 1),
            "mfu_vs_v5e_peak": round(achieved_flops / TPU_V5E_PEAK_BF16, 3),
            "v5e8_projection_scenes_per_sec": round(scenes_per_sec * 8, 4),
            "eval_scenes_per_sec_batched": (round(eval_scenes_per_sec, 5)
                                            if eval_scenes_per_sec else None),
            "eval_batch": eval_batch,
            "baseline_model": "A100 TF32 conv3d @ 25 TFLOPS effective",
            "train_scenes_per_sec": (round(train_scenes_per_sec, 2)
                                     if train_scenes_per_sec else None),
            "device": str(jax.devices()[0]),
            "iters": iters,
            # conv lowering provenance; with Winograd engaged the
            # achieved/MFU figures are algorithmic-equivalent (direct-conv
            # MACs), the standard effective-FLOPS convention
            "conv_wino": os.environ.get("COMMONSCENES_CONV_WINO", "0"),
        },
    }))


def _supervise() -> int:
    """Driver-facing resilience: the tunneled TPU restarts at random and can
    wedge an in-flight remote-compile RPC (lost-reply mode) — a bare run
    then hangs forever, or dies with "Broken pipe", and the end-of-round
    bench capture gets nothing (observed three times in the r05 eval
    chain). Run the measurement in a child process instead: gate each
    attempt on a bounded tunnel-health probe (tools/tpu_up.py), bound each
    attempt's wall time, and retry across tunnel deaths — the persistent
    compile cache makes retries resume completed compiles. On success,
    print only the child's final stdout line (the ONE JSON line).
    BENCH_SUPERVISE=0 opts out (used by external retry loops, e.g.
    tools/run_tpu_queue.sh)."""
    import subprocess

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout_s = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "2700"))
    probe_limit = int(os.environ.get("BENCH_PROBE_LIMIT", "10"))
    holder_wait = int(os.environ.get("BENCH_HOLDER_WAIT", "5400"))
    here = os.path.dirname(os.path.abspath(__file__))
    probe = os.path.join(here, "tools", "tpu_up.py")
    env = dict(os.environ, BENCH_SUPERVISE="0")

    pidfiles = os.environ.get(
        "BENCH_HOLDER_PIDFILES", "/tmp/chain.pid:/tmp/queue.pid").split(":")

    def _live_holder():
        """Another long-running TPU job on this host (two concurrent
        TPU-touching processes deadlock the tunnel). The chain/queue
        runners advertise themselves via pidfiles."""
        for pf in pidfiles:
            try:
                with open(pf) as fh:
                    pid = int(fh.read().strip())
                os.kill(pid, 0)
                return pf, pid
            except (OSError, ValueError):
                continue
        return None

    waited = 0
    while waited < holder_wait:
        holder = _live_holder()
        if holder is None:
            break
        print(f"[bench] TPU held by {holder[0]} (pid {holder[1]}) — "
              f"waiting 60s ({waited}/{holder_wait}s)",
              file=sys.stderr, flush=True)
        time.sleep(60)
        waited += 60

    for i in range(attempts):
        for p in range(probe_limit):
            try:
                if subprocess.run([sys.executable, probe], timeout=180,
                                  stdout=subprocess.DEVNULL,
                                  stderr=subprocess.DEVNULL,
                                  ).returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            print(f"[bench] tunnel down (probe {p + 1}/{probe_limit}) — "
                  "waiting 60s", file=sys.stderr, flush=True)
            time.sleep(60)
        try:
            # stderr inherits (progress stays visible); stdout is captured
            # so only the validated JSON line reaches the driver
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               timeout=timeout_s, env=env,
                               stdout=subprocess.PIPE)
            lines = (r.stdout or b"").decode().strip().splitlines()
            if r.returncode == 0 and lines:
                json.loads(lines[-1])
                print(lines[-1], flush=True)
                return 0
            print(f"[bench] attempt {i + 1} exited rc={r.returncode} "
                  f"without a JSON line", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {i + 1} timed out after {timeout_s}s",
                  file=sys.stderr, flush=True)
        except (json.JSONDecodeError, OSError) as e:
            print(f"[bench] attempt {i + 1} failed: {e}", file=sys.stderr,
                  flush=True)
        if i + 1 < attempts:
            time.sleep(30)
    print("[bench] all attempts failed", file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_SUPERVISE", "1") != "0":
        sys.exit(_supervise())
    main()
