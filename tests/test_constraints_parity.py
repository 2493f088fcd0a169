"""Golden SCA parity: our vectorized constraint checker vs the REAL
reference validate_constrains / validate_constrains_changes
(helpers/metrics_3dfront.py), imported from /root/reference with its
unavailable heavy deps stubbed.

Pins every geometric rule — including the reference's LENIENT front/behind
bands (front passes for dx >= -0.05, behind for dx <= +0.05, metrics
_3dfront.py:89-102) which a "symmetric" reimplementation silently breaks.
"""

import sys
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_STUBS = (
    "trimesh", "open3d", "seaborn", "cv2", "PIL", "PIL.Image", "mcubes",
    "einops", "imageio", "skimage", "skimage.measure", "termcolor",
    "matplotlib", "matplotlib.pyplot", "graphviz", "torchvision",
    "torchvision.utils", "tqdm", "omegaconf", "plyfile", "h5py",
    "pytorch3d", "pytorch3d.io", "pytorch3d.ops", "pytorch3d.structures",
    "pytorch3d.renderer", "pytorch3d.transforms", "pytorch3d.loss",
)

RULE_PREDS = ["left", "right", "front", "behind", "bigger than",
              "smaller than", "taller than", "shorter than", "standing on",
              "close by", "symmetrical to"]
ACC_KEYS = ["left", "right", "front", "behind", "bigger", "smaller",
            "taller", "shorter", "standing on", "close by",
            "symmetrical to", "total"]


@pytest.fixture(scope="module")
def ref():
    patch = {name: mock.MagicMock() for name in _STUBS
             if name not in sys.modules}
    with mock.patch.dict(sys.modules, patch):
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        import helpers.metrics_3dfront as m
    return m


def _random_case(rng, n_objs=14, n_triples=60):
    # positive extents, centers spread so every rule's pass AND fail
    # branches get hit (incl. the ±0.05 bands via near-zero deltas)
    boxes = np.stack([
        rng.uniform(0.2, 1.5, n_objs),          # l (z extent)
        rng.uniform(0.2, 1.5, n_objs),          # h
        rng.uniform(0.2, 1.5, n_objs),          # w (x extent)
        np.round(rng.uniform(-1, 1, n_objs), 1),  # px (multiples of 0.1
        rng.uniform(0, 0.1, n_objs),              #  land inside the bands)
        np.round(rng.uniform(-1, 1, n_objs), 1),  # pz
    ], axis=1).astype(np.float64)
    triples = np.stack([
        rng.randint(0, n_objs, n_triples),
        rng.randint(0, len(RULE_PREDS), n_triples),
        rng.randint(0, n_objs, n_triples),
    ], axis=1)
    return boxes, triples


def _run_reference(ref, boxes, triples, keep, changes):
    vocab = {"pred_idx_to_name": [p + "\n" for p in RULE_PREDS]}
    acc = {k: [] for k in ACC_KEYS}
    fn = ref.validate_constrains_changes if changes else \
        ref.validate_constrains
    return fn(torch.from_numpy(triples), torch.from_numpy(boxes), None,
              None if keep is None else torch.from_numpy(keep),
              vocab, acc, with_norm=False)


def _run_ours(boxes, triples, keep, changes):
    from commonscenes_tpu.eval.constraints import validate_constraints
    return validate_constraints(triples, boxes, RULE_PREDS, keep=keep,
                                changes_mode=changes)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_all_rules_match_reference(ref, seed):
    rng = np.random.RandomState(seed)
    boxes, triples = _random_case(rng)
    theirs = _run_reference(ref, boxes, triples, None, changes=False)
    ours = _run_ours(boxes, triples, None, changes=False)
    for k in ACC_KEYS:
        assert ours[k] == theirs[k], (k, ours[k], theirs[k])
    assert sum(len(theirs[k]) for k in ACC_KEYS[:-1]) == len(triples)


def test_keep_and_changes_mode_match_reference(ref):
    rng = np.random.RandomState(3)
    boxes, triples = _random_case(rng)
    keep = rng.randint(0, 2, len(boxes)).astype(np.int64)
    theirs = _run_reference(ref, boxes, triples, keep, changes=False)
    ours = _run_ours(boxes, triples, keep, changes=False)
    for k in ACC_KEYS:
        assert ours[k] == theirs[k], (k, ours[k], theirs[k])
    theirs_c = _run_reference(ref, boxes, triples, keep, changes=True)
    ours_c = _run_ours(boxes, triples, keep, changes=True)
    for k in ACC_KEYS:
        assert ours_c[k] == theirs_c[k], (k, ours_c[k], theirs_c[k])
    # the two modes partition the triples
    assert len(theirs["total"]) + len(theirs_c["total"]) == len(triples)


def test_box_denorm_matches_reference(ref):
    """denormalize_box_params (util.py:536-562, re-exported by the metrics
    module): z-score with the published bedroom stats and scale 3."""
    from commonscenes_tpu.data.synthetic import (denormalize_boxes,
                                                 normalize_boxes)
    rng = np.random.RandomState(0)
    x = rng.randn(6)
    np.testing.assert_allclose(denormalize_boxes(x),
                               ref.denormalize_box_params(x, params=6),
                               rtol=1e-5)
    np.testing.assert_allclose(normalize_boxes(denormalize_boxes(x)), x,
                               rtol=1e-4, atol=1e-5)


def test_angular_stats_match_reference(ref):
    from commonscenes_tpu.eval.constraints import (estimate_angular_mean,
                                                   estimate_angular_std)
    rng = np.random.RandomState(0)
    for degs in (rng.uniform(0, 360, 25),
                 np.array([350.0, 10.0, 5.0, 355.0])):   # wraparound cluster
        # means agree as directions; the reference can emit 360.0 where we
        # normalize to 0.0 (phase(-1e-16) % 360 float artifact)
        dm = (estimate_angular_mean(degs)
              - ref.estimate_angular_mean(degs)) % 360.0
        assert min(dm, 360.0 - dm) < 1e-9
        np.testing.assert_allclose(estimate_angular_std(degs),
                                   ref.estimate_angular_std(degs), atol=1e-9)


def test_front_behind_lenient_band(ref):
    """|dx| < 0.05 (and no overlap): BOTH front and behind pass."""
    from commonscenes_tpu.eval.constraints import check_rules
    s = np.array([[1.0, 1.0, 1.0, 0.02, 0.0, 5.0]])
    o = np.array([[1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
    assert check_rules(["front"], s, o)[0] == 1
    assert check_rules(["behind"], s, o)[0] == 1
    far = s.copy()
    far[0, 3] = -2.0
    assert check_rules(["front"], far, o)[0] == 0
