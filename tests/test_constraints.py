"""Constraint-accuracy (SCA) rule tests with hand-constructed boxes."""

import numpy as np

from commonscenes_tpu.data.vocab import PREDICATES, Vocab
from commonscenes_tpu.eval.constraints import (aabb_overlap_over_min,
                                               accuracy_summary, check_rules,
                                               min_corner_distance,
                                               validate_constraints)

# box = [l(z), h(y), w(x), px, py, pz]
BASE = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], np.float64)


def boxes(*rows):
    return np.asarray(rows, np.float64)


def test_left_right():
    s = BASE.copy(); o = BASE.copy()
    s[5] = -2.0  # subject far left in z
    r = check_rules(["left"], boxes(s), boxes(o))
    assert r[0] == 1
    r = check_rules(["right"], boxes(s), boxes(o))
    assert r[0] == 0
    r = check_rules(["right"], boxes(o), boxes(s))
    assert r[0] == 1


def test_left_fails_when_overlapping():
    s = BASE.copy(); o = BASE.copy()
    s[5] = -0.06  # barely left but heavy 3D overlap
    assert aabb_overlap_over_min(boxes(s), boxes(o))[0] > 0.3
    r = check_rules(["left"], boxes(s), boxes(o), strict=True)
    assert r[0] == 0
    r = check_rules(["left"], boxes(s), boxes(o), strict=False)
    assert r[0] == 1


def test_front_behind():
    s = BASE.copy(); o = BASE.copy()
    s[3] = 2.0
    assert check_rules(["front"], boxes(s), boxes(o))[0] == 1
    assert check_rules(["behind"], boxes(s), boxes(o))[0] == 0
    assert check_rules(["behind"], boxes(o), boxes(s))[0] == 1


def test_bigger_smaller_taller_shorter():
    s = BASE.copy(); o = BASE.copy()
    s[:3] = [2, 2, 2]
    assert check_rules(["bigger than"], boxes(s), boxes(o))[0] == 1
    assert check_rules(["smaller than"], boxes(o), boxes(s))[0] == 1
    s2 = BASE.copy(); s2[1] = 2.0   # taller: top at 2 vs 1
    assert check_rules(["taller than"], boxes(s2), boxes(o))[0] == 1
    assert check_rules(["shorter than"], boxes(o), boxes(s2))[0] == 1


def test_standing_on_and_close_by():
    s = BASE.copy(); o = BASE.copy()
    s[4] = 0.03
    assert check_rules(["standing on"], boxes(s), boxes(o))[0] == 1
    s[4] = 0.05
    assert check_rules(["standing on"], boxes(s), boxes(o))[0] == 0
    far = BASE.copy(); far[3] = 10.0
    assert check_rules(["close by"], boxes(far), boxes(o))[0] == 0
    near = BASE.copy(); near[3] = 1.2
    assert check_rules(["close by"], boxes(near), boxes(o))[0] == 1


def test_symmetrical():
    s = BASE.copy(); s[3], s[5] = 1.0, 0.0
    o = BASE.copy(); o[3], o[5] = -1.0, 0.0
    assert check_rules(["symmetrical to"], boxes(s), boxes(o))[0] == 1
    o2 = BASE.copy(); o2[3], o2[5] = -3.0, 0.0
    assert check_rules(["symmetrical to"], boxes(s), boxes(o2))[0] == 0


def test_min_corner_distance_touching():
    a = BASE.copy()                      # x ∈ [-.5,.5]
    b = BASE.copy(); b[3] = 1.0          # x ∈ [.5, 1.5]
    d = min_corner_distance(boxes(a), boxes(b))
    np.testing.assert_allclose(d[0], 0.0, atol=1e-9)


def test_validate_constraints_keep_filter():
    tri = np.array([[0, PREDICATES.index("left"), 1],
                    [1, PREDICATES.index("right"), 0]])
    s = BASE.copy(); s[5] = -2.0
    bx = boxes(s, BASE)
    keep = np.array([1, 0])  # node 1 manipulated
    acc = validate_constraints(tri, bx, PREDICATES, keep=keep)
    assert len(acc["total"]) == 0   # generation-mode skips touched triples
    acc = validate_constraints(tri, bx, PREDICATES, keep=keep,
                               changes_mode=True)
    assert len(acc["total"]) == 2
    summary = accuracy_summary(acc)
    assert summary["left"] == 1.0 and summary["right"] == 1.0
