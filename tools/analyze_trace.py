"""Summarize a jax.profiler trace into a per-op device-time breakdown.

Feeds VERDICT r4 #4: attribute one UNet CFG-step's device time to conv
kernels / Pallas kernels / HBM-bound fusions / gaps, so the next MFU
lever is chosen from a measurement instead of a guess. The reference has
no analogue (torch profiler fills this role there); this parses the
xplane protos jax.profiler writes using the installed xprof converter.

Usage:
  python tools/analyze_trace.py /tmp/trace_dir            # summary JSON
  python tools/analyze_trace.py /tmp/trace_dir --csv out.csv  # full table

The trace dir is whatever was passed to jax.profiler.trace(...); the
xplane.pb is found recursively (plugins/profile/<run>/<host>.xplane.pb).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_xplanes(trace_dir: str):
    pats = [os.path.join(trace_dir, "**", "*.xplane.pb")]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(out)


CATEGORIES = (
    ("conv", ("convolution", "conv_general", "cudnn", "conv")),
    ("pallas", ("custom-call", "tpu_custom_call", "pallas", "mosaic")),
    ("matmul", ("dot", "einsum", "matmul")),
    ("copy/layout", ("copy", "transpose", "bitcast", "reshape", "pad",
                     "slice", "concatenate", "gather", "scatter",
                     "dynamic-update", "dynamic-slice")),
    ("reduce/norm", ("reduce", "norm")),
    ("infeed/outfeed", ("infeed", "outfeed", "host")),
)


def categorize(name: str, cat: str) -> str:
    s = (name + " " + cat).lower()
    for label, keys in CATEGORIES:
        if any(k in s for k in keys):
            return label
    return "elementwise/other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--csv", default="", help="also write the full op table")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    xs = find_xplanes(args.trace_dir)
    if not xs:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")

    from xprof.convert import raw_to_tool_data as rtd

    # framework_op_stats = the per-op table (device time, occurrences,
    # FLOP rate where known). xprof returns a LIST of gviz DataTables as
    # JSON (host table + device table), regardless of the tqx hint — the
    # out:csv path is not wired in this build (verified on a smoke trace).
    data, _ = rtd.xspace_to_tool_data(
        xs, "framework_op_stats", {"tqx": "out:json;"})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    if not isinstance(tables, list):
        tables = [tables]

    ops = []
    for tbl in tables:
        ids = [c.get("id", "") for c in tbl.get("cols", [])]

        def col(cells, name, default=""):
            if name not in ids:
                return default
            i = ids.index(name)
            if i >= len(cells):
                return default
            v = (cells[i] or {}).get("v")
            return default if v is None else v

        for row in tbl.get("rows", []):
            cells = row.get("c", [])
            op = str(col(cells, "operation"))
            if not op or op == "IDLE":
                continue
            try:
                t = float(col(cells, "total_self_time", 0) or 0)
            except (TypeError, ValueError):
                continue
            ops.append({
                "op": op,
                "type": str(col(cells, "type")),
                "self_us": t,
                "host": str(col(cells, "host_or_device")).lower() == "host",
                "occurrences": col(cells, "occurrences"),
                "flop_rate": col(cells, "measured_flop_rate"),
                "bandwidth": col(cells, "measured_memory_bw"),
                "intensity": col(cells, "operational_intensity"),
                "bound_by": col(cells, "bound_by"),
            })

    dev = [o for o in ops if not o["host"]]
    scope = "device"
    if not dev:  # e.g. a CPU smoke trace: no device plane at all
        dev = [o for o in ops if o["host"]]
        scope = "host (no device ops in trace)"
    total = sum(o["self_us"] for o in dev) or 1.0
    by_cat = {}
    for o in dev:
        c = categorize(o["op"], o["type"])
        by_cat[c] = by_cat.get(c, 0.0) + o["self_us"]

    dev.sort(key=lambda o: -o["self_us"])
    fields = ("op", "type", "self_us", "occurrences", "flop_rate",
              "bandwidth", "intensity", "bound_by")
    summary = {
        "xplanes": xs,
        "scope": scope,
        "device_total_us": round(total, 1),
        "by_category_us": {k: round(v, 1)
                           for k, v in sorted(by_cat.items(),
                                              key=lambda kv: -kv[1])},
        "by_category_pct": {k: round(100 * v / total, 1)
                            for k, v in sorted(by_cat.items(),
                                               key=lambda kv: -kv[1])},
        "top_ops": [{k: o[k] for k in fields} for o in dev[:args.top]],
    }
    if args.csv:
        import csv as _csv
        with open(args.csv, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=fields + ("host",))
            w.writeheader()
            for o in sorted(ops, key=lambda o: -o["self_us"]):
                w.writerow(o)
        summary["csv"] = args.csv
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
