"""Vocabulary handling for SG-FRONT scene graphs.

Mirrors the reference's vocab construction (dataset/threedfront_dataset.py:
84-161): class lists from ``classes_{room}.txt`` (optionally coarsened via
``mapping.json``), predicate list = ['in'] + relationships.txt, and the
inverse-relationship dictionary used by the manipulation modes
(threedfront_dataset.py:23-39).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

# SG-FRONT relationship order (relationships.txt; 'in' is prepended as id 0
# for the synthetic scene-root edges, threedfront_dataset.py:89-91).
RELATIONSHIPS: List[str] = [
    "left", "right", "front", "behind", "close by", "above", "standing on",
    "bigger than", "smaller than", "taller than", "shorter than",
    "symmetrical to", "same style as", "same super category as",
    "same material as",
]

PREDICATES: List[str] = ["in"] + RELATIONSHIPS   # id == index

# inverse-relationship mapping for manipulation
# (threedfront_dataset.py:23-39)
INVERSE_RELATIONSHIP: Dict[str, str] = {
    "left": "right", "right": "left", "front": "behind", "behind": "front",
    "bigger than": "smaller than", "smaller than": "bigger than",
    "taller than": "shorter than", "shorter than": "taller than",
    "close by": "close by", "same style as": "same style as",
    "same super category as": "same super category as",
    "same material as": "same material as", "symmetrical to": "symmetrical to",
    "standing on": "standing on", "above": "above",
}

# predicate ids whose change is geometrically evaluatable
# (threedfront_dataset.py:643-644)
INTERPRETABLE_REL_IDS = (1, 2, 3, 4, 8, 9, 10, 11)

# A compact coarse class list used by the synthetic data pipeline and tests
# (a real run reads classes_{room}.txt + mapping.json from SG-FRONT).
DEFAULT_COARSE_CLASSES: List[str] = [
    "_scene_", "bed", "cabinet", "chair", "floor", "lamp", "nightstand",
    "shelf", "sofa", "table", "tv_stand", "wardrobe",
]


@dataclass
class Vocab:
    """Class/predicate vocabulary with coarse + fine-grained views."""

    obj_classes: List[str]                 # sorted coarse classes
    obj_classes_grained: List[str]         # sorted fine-grained classes
    predicates: List[str] = field(default_factory=lambda: list(PREDICATES))
    grained_to_coarse: Optional[Dict[str, str]] = None

    def __post_init__(self):
        self.class_to_idx = {c: i for i, c in enumerate(self.obj_classes)}
        self.grained_to_idx = {c: i for i, c in
                               enumerate(self.obj_classes_grained)}
        self.pred_to_idx = {p: i for i, p in enumerate(self.predicates)}

    @property
    def num_obj_classes(self) -> int:
        return len(self.obj_classes)

    @property
    def num_pred_classes(self) -> int:
        return len(self.predicates)

    @property
    def scene_class_id(self) -> int:
        return self.class_to_idx["_scene_"]

    def inverse_pred_id(self, pred_id: int) -> int:
        """Id of the inverse predicate; identity when the vocabulary does
        not contain the inverse (non-inverse-closed relationship lists)."""
        name = self.predicates[pred_id]
        return self.pred_to_idx.get(
            INVERSE_RELATIONSHIP.get(name, name), pred_id)

    @classmethod
    def synthetic(cls) -> "Vocab":
        classes = sorted(DEFAULT_COARSE_CLASSES)
        return cls(obj_classes=classes, obj_classes_grained=classes,
                   grained_to_coarse={c: c for c in classes})

    @classmethod
    def from_sgfront(cls, root: str, room_type: str = "bedroom",
                     large: bool = False) -> "Vocab":
        """Read classes_{room}.txt (+ mapping.json when large=False) and
        relationships.txt from an SG-FRONT directory."""
        with open(os.path.join(root, f"classes_{room_type}.txt")) as f:
            grained = [ln.strip() for ln in f if ln.strip()]
        rel_path = os.path.join(root, "relationships.txt")
        predicates = list(PREDICATES)
        if os.path.exists(rel_path):
            with open(rel_path) as f:
                predicates = ["in"] + [ln.strip() for ln in f if ln.strip()]
        mapping = None
        map_path = os.path.join(root, "mapping.json")
        if not large and os.path.exists(map_path):
            # tolerate a missing mapping.json like SGFrontDataset does
            # (grained names used as coarse classes directly)
            with open(map_path) as f:
                mapping = json.load(f)
            coarse = set(mapping.get(g, g) for g in grained)
        else:
            coarse = set(grained)
        # the '_scene_' root class is always present (the reference's
        # classes_{room}.txt files include it; threedfront_dataset.py:448-459
        # appends root nodes with class id 0 = sorted-first '_scene_')
        coarse.add("_scene_")
        grained_set = set(grained)
        grained_set.add("_scene_")
        return cls(obj_classes=sorted(coarse),
                   obj_classes_grained=sorted(grained_set),
                   predicates=predicates,
                   grained_to_coarse=mapping)
