"""GT-side consistency collection.

Capability parity with the live path of reference
scripts/collect_consistency.py:244-300: for every scene, enumerate object
pairs that share the same 3D-FUTURE model id (``model_jid``) and record
them as "same as" consistency edges; write the aggregate
``consistencies_{room}_{split}.json`` ({"scans": [{"scan", "objects",
"consistency"}]}) that ``cli/consistency_check.py`` consumes, plus an
optional per-scene DOT graph (the reference's ``visualize_scene_graph``,
:43-108). The reference's per-object crop *rendering* is dead code there
(commented out, :109-189) — the shipped metric consumes only the pair
lists, which this produces from the SG-FRONT tree alone.

Pair ids are the dataset INSTANCE ids (the convention
cli/consistency_check.py maps through layouts.json instance_ids).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys


def collect_scene_consistency(dataset, scan_id):
    """One scene's {"scan", "objects", "consistency"} record: pairs of
    instances backed by the same 3D-FUTURE model
    (collect_consistency.py:271-287)."""
    objects = {str(i): label
               for i, label in dataset.objs.get(scan_id, {}).items()}
    mids = dataset.model_ids_for_scan(scan_id)
    rel = []
    for a, b in itertools.combinations(sorted(mids), 2):
        if mids[a] == mids[b]:
            rel.append([a, b, 16, "same as"])
    return {"scan": scan_id, "objects": objects, "consistency": rel}


def export_consistency_dot(path, record):
    """DOT counterpart of the reference's graphviz consistency graph
    (collect_consistency.py:43-108): nodes = labeled objects, edges only
    for 'same as' pairs."""
    lines = ["graph consistency {", '  node [fontname="helvetica"];']
    used = set()
    for a, b, _, text in record["consistency"]:
        used.update((str(a), str(b)))
    for inst, label in record["objects"].items():
        if inst in used:
            lines.append(f'  n{inst} [label="{label}_{inst}", '
                         f'style=filled, fillcolor=lightblue];')
    for a, b, _, text in record["consistency"]:
        lines.append(f'  n{a} -- n{b} [label="{text}"];')
    lines.append("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help="SG-FRONT root")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--split", default="test",
                   choices=["train", "test"])
    p.add_argument("--out", default="",
                   help="output json (default: "
                        "<dataset>/consistencies_{room}_{split}.json)")
    p.add_argument("--graphs_dir", default="",
                   help="also write per-scene DOT consistency graphs here")
    args = p.parse_args(argv)

    from commonscenes_tpu.data.sgfront import SGFrontDataset
    ds = SGFrontDataset(args.dataset, split=args.split,
                        room_type=args.room_type, use_sdf=False,
                        with_clip=False)

    records = []
    n_pairs = 0
    if args.graphs_dir:
        os.makedirs(args.graphs_dir, exist_ok=True)
    for scan_id in ds.scans:
        rec = collect_scene_consistency(ds, scan_id)
        records.append(rec)
        n_pairs += len(rec["consistency"])
        if args.graphs_dir and rec["consistency"]:
            export_consistency_dot(
                os.path.join(args.graphs_dir, f"{scan_id}.dot"), rec)

    out = args.out or os.path.join(
        args.dataset, f"consistencies_{args.room_type}_{args.split}.json")
    with open(out, "w") as f:
        json.dump({"scans": records}, f)
    print(f"[*] {len(records)} scenes, {n_pairs} same-model pairs → {out}")
    return {"scenes": len(records), "pairs": n_pairs, "out": out}


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
