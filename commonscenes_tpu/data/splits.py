"""3D-FRONT split bookkeeping (the vendored-ATISS subset the reference
actually uses).

Capability parity with scripts/scene_synthesis/datasets/splits_builder.py
(CSV splits per room type, consumed by the FID pipeline and consistency
collection — compute_fid_scores_3dfront.py:24-25) plus the room-type
prefix filtering of compute_fid_scores_3dfront.py:96-116 and the
blacklist/invalid-room files in config/.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Sequence

ROOM_PREFIXES = {
    "bedroom": ("Bedroom", "MasterBedroom", "SecondBedroom"),
    "livingroom": ("LivingRoom", "LivingDiningRoom"),
    "diningroom": ("DiningRoom", "LivingDiningRoom"),
    "library": ("Library",),
}


class CSVSplitsBuilder:
    """Reads ``{room}_threed_front_splits.csv`` (rows: scene_id, split)."""

    def __init__(self, csv_path: str):
        self.csv_path = csv_path
        self._splits: Dict[str, List[str]] = {}
        with open(csv_path) as f:
            for row in csv.reader(f):
                if len(row) < 2:
                    continue
                scene_id, split = row[0].strip(), row[1].strip()
                self._splits.setdefault(split, []).append(scene_id)

    def get_splits(self, keep: Sequence[str]) -> List[str]:
        out: List[str] = []
        for k in keep:
            out.extend(self._splits.get(k, []))
        return out

    @property
    def train_ids(self) -> List[str]:
        return self.get_splits(["train", "val"])

    @property
    def test_ids(self) -> List[str]:
        return self.get_splits(["test"])


def filter_scenes_by_room(scene_names: Sequence[str], room_type: str
                          ) -> List[str]:
    """Prefix filter (compute_fid_scores_3dfront.py:96-116)."""
    prefixes = ROOM_PREFIXES.get(room_type, ())
    return [s for s in scene_names
            if any(s.split("-")[0].startswith(p) for p in prefixes)]


def load_blacklist(path: str) -> List[str]:
    """config/black_list.txt / invalid_threed_front_rooms.txt readers."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]
