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
    # FLOP rate where known); returned as CSV when tqx=out:csv
    data, _ = rtd.xspace_to_tool_data(
        xs, "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()

    import csv as _csv
    import io
    rows = list(_csv.reader(io.StringIO(data)))
    if not rows:
        sys.exit("empty op stats")
    hdr = rows[0]
    idx = {h: i for i, h in enumerate(hdr)}

    def col(r, *names, default=""):
        for n in names:
            if n in idx and idx[n] < len(r):
                return r[idx[n]]
        return default

    ops = []
    for r in rows[1:]:
        if not r or len(r) < 3:
            continue
        try:
            t = float(col(r, "total_self_time", "Total self-time (us)",
                          "self_time_us", default="0") or 0)
        except ValueError:
            continue
        host = (col(r, "host_or_device", "Host/device").lower() == "host")
        ops.append({
            "op": col(r, "operation", "Operation", "op_name"),
            "type": col(r, "type", "Type", "category"),
            "self_us": t,
            "host": host,
            "occurrences": col(r, "occurrences", "#Occurrences"),
            "flop_rate": col(r, "measured_flop_rate",
                             "Normalized FLOP Rate (GFLOPs/Sec)"),
            "bandwidth": col(r, "measured_memory_bw",
                             "Measured memory BW (GBytes/Sec)"),
            "bound_by": col(r, "bound_by", "Bound by"),
        })

    dev = [o for o in ops if not o["host"]]
    total = sum(o["self_us"] for o in dev) or 1.0
    by_cat = {}
    for o in dev:
        c = categorize(o["op"], o["type"])
        by_cat[c] = by_cat.get(c, 0.0) + o["self_us"]

    dev.sort(key=lambda o: -o["self_us"])
    summary = {
        "xplanes": xs,
        "device_total_us": round(total, 1),
        "by_category_us": {k: round(v, 1)
                           for k, v in sorted(by_cat.items(),
                                              key=lambda kv: -kv[1])},
        "by_category_pct": {k: round(100 * v / total, 1)
                            for k, v in sorted(by_cat.items(),
                                               key=lambda kv: -kv[1])},
        "top_ops": [{k: o[k] for k in
                     ("op", "type", "self_us", "occurrences", "flop_rate",
                      "bandwidth", "bound_by")}
                    for o in dev[:args.top]],
    }
    if args.csv:
        with open(args.csv, "w") as f:
            f.write(data)
        summary["csv"] = args.csv
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
