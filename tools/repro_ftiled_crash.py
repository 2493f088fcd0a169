"""Minimal repro + bisection for the f-tiled FFN fwd+bwd compile crash.

Symptom (PERFORMANCE.md, ops/fused_transformer.py:_ffn_impl): with
`COMMONSCENES_FFN_KERNEL=ftiled_always`, compiling a fwd+bwd program that
contains the f-tiled GEGLU kernel kills the TPU compile helper (SIGKILL —
the python process dies without a traceback). The identical kernel
compiles and runs fine (a) standalone, (b) inside the forward-only
sampling program, and (c) with the `rows` kernel substituted. Training
therefore auto-gates to `rows` via the static `inference` flag.

Hypothesis: host-OOM. The f-tiled pallas_call has a 2-D grid and seven
per-tile BlockSpecs; under `jax.grad` + `jax.checkpoint` the UNet's remat
re-instantiates every kernel in both the forward and the rematerialised
backward pass, multiplying Mosaic lowering work. On this box (one CPU
core, the compile helper sharing RAM with the trace) the lowering's peak
RSS exceeds the limit and the kernel OOM-killer SIGKILLs it — which
presents exactly as "crashes the TPU compile helper".

This script confirms/denies that by compiling fwd+bwd programs with an
increasing number of transformer blocks (depth 1, 2, 4, 8 ...), each in a
fresh subprocess, while sampling the subprocess tree's peak RSS. Output:
one JSON line per depth {depth, rc, signal, peak_rss_gb, wall_s}. A clean
rc=0 at depth 1 with rising peak RSS and a -9 at some depth N pins the
root cause as host memory, not a Mosaic bug; a -9 at depth 1 would point
at the kernel itself.

CAUTION: run only when nothing else is using the TPU tunnel — a helper
crash can wedge the tunnel for subsequent processes (the reason this is
a standalone tool, not a test).

Usage:  python tools/repro_ftiled_crash.py [--depths 1,2,4,8] [--cpu]
        --cpu runs on the CPU backend instead — NOTE the kernels fall
        back to interpret mode there (ops/fused_transformer.py:_interpret),
        so no Mosaic lowering happens; --cpu only sanity-checks the
        script's plumbing, it cannot reproduce or calibrate the crash.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CHILD = r"""
import os, sys
import jax, jax.numpy as jnp

depth = int(sys.argv[1])
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from commonscenes_tpu.ops.fused_transformer import ffn_fused

C, F, M = 448, 1792, 4096   # the reference operating point's 16^3 stage
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 7)
params = dict(
    ln_s=jnp.ones((C,), jnp.float32),
    ln_b=jnp.zeros((C,), jnp.float32),
    w1=(jax.random.normal(ks[0], (C, 2 * F), jnp.bfloat16) * 0.02),
    b1=jnp.zeros((2 * F,), jnp.float32),
    w2=(jax.random.normal(ks[1], (F, C), jnp.bfloat16) * 0.02),
    b2=jnp.zeros((C,), jnp.float32),
)
x = jax.random.normal(ks[2], (M, C), jnp.bfloat16)

def loss(p, x):
    h = x
    for _ in range(depth):
        blk = lambda h_: ffn_fused(h_, p["ln_s"], p["ln_b"], p["w1"],
                                   p["b1"], p["w2"], p["b2"],
                                   1e-5, True)  # ftiled path
        h = jax.checkpoint(blk)(h)              # remat, like the UNet
    return jnp.sum(h.astype(jnp.float32) ** 2)

g = jax.jit(jax.grad(loss))(params, x)
jax.block_until_ready(g)
print("OK", depth)
"""


def run_depth(depth: int, cpu: bool) -> dict:
    env = dict(os.environ, COMMONSCENES_FFN_KERNEL="ftiled_always")
    args = [sys.executable, "-c", CHILD, str(depth)] + (["--cpu"] if cpu else [])
    t0 = time.time()
    proc = subprocess.Popen(args, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))
    peak = 0
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        peak = max(peak, int(line.split()[1]) * 1024)
        except OSError:
            pass
        time.sleep(0.5)
    rc = proc.returncode
    return {
        "depth": depth,
        "rc": rc,
        "signal": -rc if rc and rc < 0 else None,
        "peak_rss_gb": round(peak / 2**30, 2),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    for d in [int(x) for x in args.depths.split(",")]:
        print(json.dumps(run_depth(d, args.cpu)), flush=True)


if __name__ == "__main__":
    main()
