#!/usr/bin/env python
"""Merge CPU-insurance eval artifacts into the round's EVAL_r* directory.

The real-chip chain (tools/run_eval_chain.sh) and the CPU insurance chain
(tools/run_eval_chain_cpu.sh) write the same artifact names into different
out dirs. This merges the insurance run into the committed report dir
WITHOUT overwriting anything the real-chip run already produced: a file is
copied only if the destination is missing or is not a valid JSON/score
artifact (e.g. a truncated log committed as a .json — the round-4 failure
mode). Every copied file gets a "backend" provenance key injected when it
is a JSON object.

Usage: python tools/merge_eval_artifacts.py --src /tmp/eval_cpu2 --dst EVAL_r05
"""
import argparse
import json
import os
import shutil


def _valid_json(path: str):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _copy_json(src: str, dst: str, backend: str) -> None:
    obj = _valid_json(src)
    if isinstance(obj, dict):
        obj.setdefault("backend", backend)
        with open(dst, "w") as f:
            json.dump(obj, f, indent=2)
            f.write("\n")
    else:
        shutil.copyfile(src, dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="insurance run out dir")
    ap.add_argument("--dst", required=True, help="committed report dir")
    ap.add_argument("--backend", default="cpu",
                    help="provenance tag injected into copied JSON objects")
    args = ap.parse_args()

    copied, kept = [], []
    for root, _dirs, files in os.walk(args.src):
        rel_root = os.path.relpath(root, args.src)
        for name in files:
            src = os.path.join(root, name)
            rel = os.path.normpath(os.path.join(rel_root, name))
            dst = os.path.join(args.dst, rel)
            if name.endswith(".json"):
                if _valid_json(dst) is not None:
                    kept.append(rel)   # real-chip artifact wins
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                _copy_json(src, dst, args.backend)
                copied.append(rel)
            else:
                if os.path.exists(dst) and os.path.getsize(dst) > 0:
                    kept.append(rel)
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)
                copied.append(rel)

    print(json.dumps({"copied": sorted(copied), "kept": sorted(kept)},
                     indent=2))


if __name__ == "__main__":
    main()
