"""A/B matrix driver for bench.py env knobs.

Runs each knob configuration through ``python bench.py`` (sampling-only by
default: BENCH_EVAL_SCENES=0 BENCH_TRAIN=0) as a SEPARATE sequential
subprocess — the tunneled TPU deadlocks if two processes touch it at once —
and appends one JSON line per run to ``/tmp/bench_ab_results.jsonl``.

Resume-safe: a config whose (git_head, knobs) already appears in the
results file is skipped, so the script can be re-run after a tunnel drop
and it picks up where it stopped. A cheap 60 s liveness probe runs first
so a wedged tunnel fails fast instead of eating a 30-min timeout.

Usage:
    python bench_ab.py                 # full matrix
    python bench_ab.py --only default winograd_f2
    python bench_ab.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.environ.get("BENCH_AB_RESULTS", "/tmp/bench_ab_results.jsonl")

# Each entry: name -> extra env. Baseline bench env is shared.
# Ordered cheapest-first: XLA-path cells share most of the compile cache;
# the Pallas Winograd cells (Mosaic compile, the round-3 TIMEOUT) run LAST
# so a slow/wedged cell can't starve the rest of the matrix.
MATRIX = {
    "default": {},
    "winograd_f2": {"COMMONSCENES_CONV_WINO": "f2"},
    "winograd_f2_bf16": {"COMMONSCENES_CONV_WINO": "f2",
                         "COMMONSCENES_WINO_DTYPE": "bf16"},
    "winograd_f2_gn0": {"COMMONSCENES_CONV_WINO": "f2",
                        "COMMONSCENES_FUSED_GN": "0"},
    "winograd_f2_minhw65": {"COMMONSCENES_CONV_WINO": "f2",
                            "COMMONSCENES_WINO_MIN_HW": "65"},
    "ffn_rows": {"COMMONSCENES_FFN_KERNEL": "rows"},
    "skip_split_off": {"COMMONSCENES_SKIP_SPLIT": "0"},
    # train-scope cells (VERDICT r3 #6): compare train_scenes_per_sec in
    # `extra` — the sampling value is unchanged vs their inference twins
    "train_default": {"BENCH_TRAIN": "8"},
    "winograd_f2_train_all": {"COMMONSCENES_CONV_WINO": "f2",
                              "COMMONSCENES_CONV_WINO_SCOPE": "all",
                              "BENCH_TRAIN": "8"},
    "winograd_pallas": {"COMMONSCENES_CONV_WINO": "pallas"},
    "winograd_pallas_gn0": {"COMMONSCENES_CONV_WINO": "pallas",
                            "COMMONSCENES_FUSED_GN": "0"},
    # --- round-4 second wave: combos around the skip_split_off winner ---
    "ss_off_cfg_dedup_off": {"COMMONSCENES_SKIP_SPLIT": "0",
                             "COMMONSCENES_CFG_DEDUP": "0"},
    "ss_off_upsample_naive": {"COMMONSCENES_SKIP_SPLIT": "0",
                              "COMMONSCENES_UPSAMPLE": "naive"},
    "ss_off_gn0": {"COMMONSCENES_SKIP_SPLIT": "0",
                   "COMMONSCENES_FUSED_GN": "0"},
    "ss_off_flash0": {"COMMONSCENES_SKIP_SPLIT": "0",
                      "COMMONSCENES_FLASH": "0"},
    "ss_off_fused_attn0": {"COMMONSCENES_SKIP_SPLIT": "0",
                           "COMMONSCENES_FUSED_ATTN": "0"},
    "ss_off_fused_ffn0": {"COMMONSCENES_SKIP_SPLIT": "0",
                          "COMMONSCENES_FUSED_FFN": "0"},
    "ss_off_train": {"COMMONSCENES_SKIP_SPLIT": "0", "BENCH_TRAIN": "8"},
    # batched-eval cells (VERDICT r3 #5): compare
    # extra.eval_scenes_per_sec_batched across decode chunk sizes
    "ss_off_eval_b2": {"COMMONSCENES_SKIP_SPLIT": "0",
                       "BENCH_EVAL_SCENES": "2"},
    "ss_off_eval_b2_chunk4": {"COMMONSCENES_SKIP_SPLIT": "0",
                              "BENCH_EVAL_SCENES": "2",
                              "COMMONSCENES_DECODE_CHUNK": "4"},
    "ss_off_eval_b2_chunk32": {"COMMONSCENES_SKIP_SPLIT": "0",
                               "BENCH_EVAL_SCENES": "2",
                               "COMMONSCENES_DECODE_CHUNK": "32"},
}

BASE_ENV = {
    "BENCH_ITERS": os.environ.get("BENCH_ITERS", "5"),
    "BENCH_EVAL_SCENES": os.environ.get("BENCH_EVAL_SCENES", "0"),
    "BENCH_TRAIN": os.environ.get("BENCH_TRAIN", "0"),
}

PROBE = (
    "import jax, jax.numpy as jnp;"
    "assert jax.devices()[0].platform != 'cpu', jax.devices();"
    "x = jnp.ones((256, 256), jnp.bfloat16);"
    "print('probe ok', float((x @ x).sum()))"
)

# bench-geometry knobs that must not leak from the ambient shell either
# (every COMMONSCENES_* var is cleared by prefix in run_one)
_GEOMETRY_KNOBS = ("BENCH_UNET_REMAT", "BENCH_DDIM_STEPS", "BENCH_SCENES")


def git_head() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
            text=True).strip()
    except Exception:
        return "unknown"


def _key(head: str, name: str, knobs: dict) -> tuple:
    return (head, name, json.dumps(knobs, sort_keys=True))


def load_done() -> set:
    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("value") is not None:
                    done.add(_key(rec.get("head"), rec.get("name"),
                                  rec.get("knobs", {})))
    return done


def tpu_alive(timeout: int = 90) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], cwd=ROOT, timeout=timeout,
            capture_output=True, text=True)
        return out.returncode == 0 and "probe ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def run_one(name: str, knobs: dict, timeout: int) -> dict:
    env = dict(os.environ)
    # cell isolation: no ambient knob leaks in — clear EVERY model knob by
    # prefix (17+ COMMONSCENES_* vars exist, not just the matrix's five)
    # plus the bench geometry overrides
    for k in list(env):
        if k.startswith("COMMONSCENES_") or k in _GEOMETRY_KNOBS:
            env.pop(k)
    env.update(BASE_ENV)
    env.update(knobs)
    t0 = time.time()
    rec = {"name": name, "knobs": knobs, "head": git_head(),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=ROOT, env=env,
            timeout=timeout, capture_output=True, text=True)
        rec["rc"] = out.returncode
        rec["value"] = None
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue          # truncated/interleaved line: keep looking
                rec["value"] = parsed.get("value")
                rec["extra"] = parsed.get("extra", {})
                break
        if rec["value"] is None:
            rec["tail"] = (out.stdout + out.stderr)[-2000:]
    except subprocess.TimeoutExpired:
        rec["rc"] = -1
        rec["value"] = None
        rec["tail"] = "TIMEOUT"
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-run timeout, seconds (cold compile ~8-20 min; "
                         "Pallas-Winograd Mosaic compiles can exceed 40 min)")
    ap.add_argument("--force", action="store_true",
                    help="re-run configs already in the results file")
    ap.add_argument("--wait", action="store_true",
                    help="poll the TPU every 5 min until alive, then run")
    args = ap.parse_args()

    if args.list:
        for k, v in MATRIX.items():
            print(f"{k:24s} {v}")
        return

    if args.only is not None and not args.only:
        sys.exit("--only given with no config names; see --list")
    names = args.only if args.only is not None else list(MATRIX)
    unknown = [n for n in names if n not in MATRIX]
    if unknown:
        sys.exit(f"unknown configs: {unknown}; see --list")

    if args.wait:
        while not tpu_alive():
            print(time.strftime("%H:%M:%S"), "tunnel down, retry in 5 min",
                  flush=True)
            time.sleep(300)
    elif not tpu_alive():
        sys.exit("TPU probe failed/hung — tunnel down, not starting matrix")
    print("TPU alive; running", names, flush=True)

    head = git_head()
    done = set() if args.force else load_done()
    for name in names:
        if _key(head, name, MATRIX[name]) in done:
            print(f"[skip] {name} already measured at {head}", flush=True)
            continue
        print(f"[run ] {name} {MATRIX[name]}", flush=True)
        rec = run_one(name, MATRIX[name], args.timeout)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[done] {name}: value={rec.get('value')} "
              f"wall={rec['wall_s']}s", flush=True)
        if rec.get("value") is None and rec.get("tail") == "TIMEOUT":
            # a timeout can be a wedged tunnel (stop) or just a cell whose
            # Mosaic compile blew the budget (continue) — probe to tell
            if tpu_alive():
                print("cell timed out but TPU probe OK — continuing",
                      flush=True)
            else:
                print("run timed out and TPU probe failed — tunnel wedged; "
                      "stopping", flush=True)
                break

    # summary table — only records whose knobs match the CURRENT matrix
    # definition (a same-name cell with edited knobs must not shadow it)
    print("\n=== results at", head, "===")
    if os.path.exists(RESULTS):
        best = {}
        with open(RESULTS) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                name = rec.get("name")
                if (rec.get("head") == head and rec.get("value") is not None
                        and name in MATRIX
                        and rec.get("knobs", {}) == MATRIX[name]):
                    best[name] = rec["value"]
        for name, val in sorted(best.items(), key=lambda kv: -kv[1]):
            print(f"{name:24s} {val:.4f} scenes/s")


if __name__ == "__main__":
    main()
