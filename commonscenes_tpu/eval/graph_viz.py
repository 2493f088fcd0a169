"""Scene-graph visualization as Graphviz DOT text.

Capability parity with reference helpers/visualize_graph.py:7-93 (graphviz
digraph of nodes/edges with a color palette, manipulation highlights) —
emitted as a .dot file so rendering needs no graphviz python binding; any
`dot -Tpng` turns it into the qualitative figure.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

NODE_COLOR = "#d6eaf8"
CHANGED_COLOR = "#f5b7b1"
NEW_COLOR = "#abebc6"
ROOT_COLOR = "#eeeeee"


def scene_graph_dot(objs: Sequence[int], triples: np.ndarray,
                    obj_idx_to_name: Sequence[str],
                    pred_idx_to_name: Sequence[str],
                    obj_mask: Optional[np.ndarray] = None,
                    triple_mask: Optional[np.ndarray] = None,
                    node_new: Optional[np.ndarray] = None,
                    node_changed: Optional[np.ndarray] = None,
                    hide_scene_edges: bool = True,
                    scene_class_id: Optional[int] = None) -> str:
    lines = ["digraph scene {", '  rankdir=LR;',
             '  node [shape=box, style="rounded,filled", fontname="Helvetica"];']
    objs = np.asarray(objs)
    n = len(objs)
    for i in range(n):
        if obj_mask is not None and obj_mask[i] <= 0:
            continue
        color = NODE_COLOR
        if scene_class_id is not None and objs[i] == scene_class_id:
            color = ROOT_COLOR
        if node_changed is not None and node_changed[i] > 0:
            color = CHANGED_COLOR
        if node_new is not None and node_new[i] > 0:
            color = NEW_COLOR
        name = obj_idx_to_name[objs[i]].strip()
        lines.append(f'  n{i} [label="{name}#{i}", fillcolor="{color}"];')

    triples = np.asarray(triples).reshape(-1, 3)
    for k, (s, p, o) in enumerate(triples):
        if triple_mask is not None and triple_mask.reshape(-1)[k] <= 0:
            continue
        if hide_scene_edges and p == 0:
            continue
        label = pred_idx_to_name[p].strip()
        lines.append(f'  n{s} -> n{o} [label="{label}", fontsize=9];')
    lines.append("}")
    return "\n".join(lines)


def export_dot(path: str, *args, **kwargs) -> None:
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(scene_graph_dot(*args, **kwargs))
