"""Phase-decomposition profile of the B=2 batched-eval loss (VERDICT r3 #5).

BENCH shows batched two-scene sampling losing ~2.7% per-scene vs single-
scene (0.1566 vs 0.1609, ABRESULTS_r04 ss_off_eval_b2). Decode chunking is
NOT the cause: at B=1 the packed slot count is K=8 and at B=2 it is K=16,
and both fit the default COMMONSCENES_DECODE_CHUNK=16 single-shot decode
(models/commonscenes.py:_decode_latents). This script pins the loss by
timing the three phases of the sampling program separately at both batch
sizes (protocol identical to bench.py: 5 iters, distinct keys, host fetch
of a last-buffer-dependent scalar):

  * full     — model.sample(gen_shape=True), the bench program
  * layout   — model.sample(gen_shape=False): layout-VAE z-draw + decode +
               relation encoding (per-SCENE work, reference
               eval_3dfront.py:444 -> VAEGAN_V2FULL.sample:600)
  * decode   — VQ-VAE first-stage decode alone on K latents
               (reference sdfusion minibatch loop,
               sdfusion_txt2shape_model.py:493-511)
  * denoise  — derived: full - layout - decode = the DDIM-100 CFG scan

Optionally captures real jax.profiler traces (one traced iteration per
program) when PROFILE_TRACE_DIR is set.

Prints ONE JSON object with per-scene seconds per phase at B=1 and B=2 and
the share of the per-scene regression each phase contributes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from commonscenes_tpu.core.config import FullConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import make_scene
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.eval.sampling import pack_slots
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.nn.vqvae3d import VQVAE3D

    vocab = Vocab.synthetic()
    objs_per_scene = 8
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    trace_dir = os.environ.get("PROFILE_TRACE_DIR", "")

    def timed(fn, *args_list):
        """Run fn over distinct per-iter args, honest host fetch, return s/iter."""
        out = fn(*args_list[0])
        fetch(out)
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                out = fn(*args_list[0])
                fetch(out)
        t0 = time.perf_counter()
        for a in args_list[1:]:
            out = fn(*a)
            fetch(out)
        return (time.perf_counter() - t0) / (len(args_list) - 1)

    def fetch(out):
        leaf = jax.tree.leaves(out)[-1]
        return float(np.asarray(jnp.sum(leaf[..., -1].astype(jnp.float32))))

    results = {}
    rng = np.random.RandomState(0)
    for B in (1, 2):
        cfg = FullConfig()
        cfg = cfg.replace(batch=cfg.batch.__class__(
            batch_size=B, max_objs=objs_per_scene + 1,
            max_triples=96, diffusion_bs=4, sdf_res=64))
        model = CommonScenesV2Full(cfg, vocab.num_obj_classes,
                                   vocab.num_pred_classes,
                                   dtype=jnp.bfloat16)
        scenes = [make_scene(vocab, rng, num_objs=objs_per_scene, sdf_res=64)
                  for _ in range(B)]
        batch = collate(scenes, vocab, cfg.batch, rng, with_shapes=True)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        jax.block_until_ready(variables)

        dz = cfg.layout.embedding_dim
        mean_est = jnp.zeros((dz,))
        cov_chol = jnp.eye(dz) * 0.5
        slots, _ = pack_slots(batch.dec.objs, batch.dec.obj_mask,
                              vocab.scene_class_id, bucket=8)
        slots_j = jnp.asarray(slots)
        K = int(slots.shape[0])
        z_sp, zc = cfg.vqvae.z_spatial, cfg.vqvae.embed_dim

        full = jax.jit(lambda v, d, k: model.sample(
            v, d, mean_est, cov_chol, k, gen_shape=True,
            shape_slot_idx=slots_j)["sdf"])
        layout = jax.jit(lambda v, d, k: model.sample(
            v, d, mean_est, cov_chol, k, gen_shape=False)["boxes"])
        decode = jax.jit(lambda v, z: model._decode_latents(v, z))

        keys = [(variables, batch.dec, jax.random.PRNGKey(2 + i))
                for i in range(iters + 1)]
        lat = [(variables, jax.random.normal(jax.random.PRNGKey(50 + i),
                                             (K, z_sp, z_sp, z_sp, zc),
                                             jnp.bfloat16) * 0.5)
               for i in range(iters + 1)]
        print(f"[B={B}] compiling + timing (K={K})...", file=sys.stderr,
              flush=True)
        t_full = timed(full, *keys)
        t_layout = timed(layout, *keys)
        t_decode = timed(decode, *lat)
        results[f"B{B}"] = {
            "slots_K": K,
            "full_s_per_scene": t_full / B,
            "layout_s_per_scene": t_layout / B,
            "decode_s_per_scene": t_decode / B,
            "denoise_s_per_scene": (t_full - t_layout - t_decode) / B,
            "scenes_per_sec": B / t_full,
        }

    b1, b2 = results["B1"], results["B2"]
    reg = b2["full_s_per_scene"] - b1["full_s_per_scene"]
    shares = {ph: (b2[f"{ph}_s_per_scene"] - b1[f"{ph}_s_per_scene"]) / reg
              for ph in ("layout", "decode", "denoise")} if reg > 0 else {}
    print(json.dumps({
        "protocol": f"{iters} iters/phase, distinct keys, host fetch",
        "device": str(jax.devices()[0]),
        "decode_chunk": os.environ.get("COMMONSCENES_DECODE_CHUNK", "16"),
        "results": {k: {kk: (round(vv, 5) if isinstance(vv, float) else vv)
                        for kk, vv in v.items()} for k, v in results.items()},
        "per_scene_regression_s": round(reg, 5),
        "regression_share": {k: round(v, 3) for k, v in shares.items()},
        "trace_dir": trace_dir or None,
    }, indent=1))


if __name__ == "__main__":
    main()
