"""Offline dataset statistics (reference dataset/analyse.py:23-203):
relationship-frequency and class-frequency tables for an SG-FRONT root (or
the synthetic generator), printed as text and saved as JSON; ``--charts``
additionally renders the reference's horizontal bar charts
(prepare_rel_chart, analyse.py:157-203 — log-scale x for class counts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--num_scenes", type=int, default=64)
    p.add_argument("--out", default="")
    p.add_argument("--charts", default="",
                   help="directory for relationship/class frequency bar "
                        "charts (reference analyse.py figures)")
    args = p.parse_args(argv)

    from commonscenes_tpu.data.vocab import Vocab
    if args.dataset == "synthetic":
        from commonscenes_tpu.data.synthetic import SyntheticDataset
        vocab = Vocab.synthetic()
        ds = SyntheticDataset(vocab, num_scenes=args.num_scenes, with_clip=False)
    else:
        from commonscenes_tpu.data.sgfront import SGFrontDataset
        ds = SGFrontDataset(args.dataset, "train", args.room_type,
                            with_clip=False)
        vocab = ds.vocab

    rel_counts: Counter = Counter()
    cls_counts: Counter = Counter()
    objs_per_scene, triples_per_scene = [], []
    for i in range(min(len(ds), args.num_scenes)):
        scene = ds[i]
        objs_per_scene.append(int(scene.objs.shape[0]))
        triples_per_scene.append(int(scene.triples.shape[0]))
        for p_id in scene.triples[:, 1]:
            rel_counts[vocab.predicates[int(p_id)]] += 1
        for c in scene.objs:
            cls_counts[vocab.obj_classes[int(c)]] += 1

    import numpy as np
    stats = {
        "relationship_frequencies": dict(rel_counts.most_common()),
        "class_frequencies": dict(cls_counts.most_common()),
        "objs_per_scene": {"mean": float(np.mean(objs_per_scene)),
                           "max": int(np.max(objs_per_scene))},
        "triples_per_scene": {"mean": float(np.mean(triples_per_scene)),
                              "max": int(np.max(triples_per_scene))},
    }
    print(json.dumps(stats, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(stats, f, indent=2)
    if args.charts:
        _bar_chart(rel_counts, "Relationship frequencies",
                   os.path.join(args.charts, "relationships.png"))
        _bar_chart(cls_counts, "Class frequencies",
                   os.path.join(args.charts, "classes.png"), log=True)
        print(f"[*] charts written to {args.charts}")
    return stats


def _bar_chart(counts, title: str, path: str, log: bool = False) -> None:
    """Horizontal frequency bar chart (reference prepare_rel_chart,
    dataset/analyse.py:157-203; log-scale x for the long-tailed class
    histogram, analyse.py:129)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    items = counts.most_common()
    labels = [k for k, _ in items][::-1]
    values = [v for _, v in items][::-1]
    fig, ax = plt.subplots(figsize=(8, max(3, 0.3 * len(labels))))
    ax.barh(labels, values)
    if log:
        ax.set_xscale("log")
    ax.set_title(title)
    ax.set_xlabel("count")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
