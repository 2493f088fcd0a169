"""Unit tests for the triplet-GCN (vs. a straightforward numpy reference of
the scatter/pool semantics in reference model/graph.py:124-211)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.nn.gcn import GraphTripleConv, GraphTripleConvNet
from commonscenes_tpu.core.graph import SceneView, flatten_view


def make_graph(rng, O=6, T=8, Do=16, Dp=16):
    obj_vecs = rng.randn(O, Do).astype(np.float32)
    pred_vecs = rng.randn(T, Dp).astype(np.float32)
    edges = rng.randint(0, O, size=(T, 2)).astype(np.int32)
    obj_mask = np.ones(O, np.float32)
    triple_mask = np.ones(T, np.float32)
    return obj_vecs, pred_vecs, edges, obj_mask, triple_mask


def test_gcn_shapes(rng):
    obj_vecs, pred_vecs, edges, om, tm = make_graph(rng)
    layer = GraphTripleConv(input_dim_obj=16, input_dim_pred=16, hidden_dim=32,
                            pooling="avg", residual=True)
    params = layer.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges, om, tm)
    new_obj, new_pred = layer.apply(params, obj_vecs, pred_vecs, edges, om, tm)
    assert new_obj.shape == (6, 16)
    assert new_pred.shape == (8, 16)


def test_gcn_output_dim(rng):
    obj_vecs, pred_vecs, edges, om, tm = make_graph(rng)
    net = GraphTripleConvNet(input_dim_obj=16, input_dim_pred=16, num_layers=3,
                             hidden_dim=32, output_dim=4, pooling="avg")
    params = net.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges, om, tm)
    new_obj, new_pred = net.apply(params, obj_vecs, pred_vecs, edges, om, tm)
    assert new_obj.shape == (6, 4)
    assert new_pred.shape == (8, 4)


def test_padded_triples_do_not_leak(rng):
    """A padded triple (mask 0) must not change any node output."""
    obj_vecs, pred_vecs, edges, om, tm = make_graph(rng, O=5, T=6)
    layer = GraphTripleConv(input_dim_obj=16, input_dim_pred=16, hidden_dim=32,
                            pooling="avg", residual=False)
    params = layer.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges, om, tm)

    # mask out the last triple and scramble its contents
    tm2 = tm.copy()
    tm2[-1] = 0.0
    pv2 = pred_vecs.copy()
    pv2[-1] = 1e3
    ed2 = edges.copy()
    ed2[-1] = [0, 0]

    out_a, _ = layer.apply(params, obj_vecs, pred_vecs, ed2, om, tm2)
    out_b, _ = layer.apply(params, obj_vecs, pv2, ed2, om, tm2)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_avg_pooling_matches_manual(rng):
    """Check segment pooling math against an explicit numpy loop."""
    O, T, D = 4, 5, 8
    obj_vecs, pred_vecs, edges, om, tm = make_graph(rng, O=O, T=T, Do=D, Dp=D)
    layer = GraphTripleConv(input_dim_obj=D, input_dim_pred=D, hidden_dim=16,
                            pooling="sum", residual=False,
                            mlp_normalization="none")
    params = layer.init(jax.random.PRNGKey(1), obj_vecs, pred_vecs, edges, om, tm)

    # run net1 manually through the module internals via capture
    H = 16

    def net1_apply(x):
        p = params["params"]["net1"]
        for i in range(2):
            w = p[f"dense_{i}"]["kernel"]
            b = p[f"dense_{i}"]["bias"]
            x = x @ w + b
            x = np.maximum(x, 0)  # final_nonlinearity=True in net1
        return x

    t_in = np.concatenate(
        [obj_vecs[edges[:, 0]], pred_vecs, obj_vecs[edges[:, 1]]], axis=1)
    t_out = net1_apply(t_in)
    new_s, new_o = t_out[:, :H], t_out[:, H + D:]
    pooled = np.zeros((O, H), np.float32)
    for k in range(T):
        pooled[edges[k, 0]] += new_s[k]
        pooled[edges[k, 1]] += new_o[k]

    def net2_apply(x):
        p = params["params"]["net2"]
        for i in range(2):
            w = p[f"dense_{i}"]["kernel"]
            b = p[f"dense_{i}"]["bias"]
            x = x @ w + b
            x = np.maximum(x, 0)
        return x

    expect = net2_apply(pooled)
    got, _ = layer.apply(params, obj_vecs, pred_vecs, edges, om, tm)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_flatten_view_offsets():
    B, N, T = 2, 3, 2
    objs = np.arange(B * N).reshape(B, N).astype(np.int32)
    triples = np.array(
        [[[0, 1, 2], [1, 0, 0]], [[2, 3, 1], [0, 0, 0]]], np.int32)
    view = SceneView(
        objs=jnp.asarray(objs),
        objs_grained=jnp.asarray(objs),
        obj_mask=jnp.ones((B, N), jnp.float32),
        triples=jnp.asarray(triples),
        triple_mask=jnp.asarray([[1, 1], [1, 0]], jnp.float32),
        boxes=jnp.zeros((B, N, 6)),
        angles=jnp.zeros((B, N), jnp.int32),
    )
    objs_f, om, edges, preds, tm, o2s = flatten_view(view)
    assert objs_f.shape == (6,)
    np.testing.assert_array_equal(np.asarray(edges),
                                  [[0, 2], [1, 0], [5, 4], [3, 3]])
    np.testing.assert_array_equal(np.asarray(preds), [1, 0, 3, 0])
    np.testing.assert_array_equal(np.asarray(o2s), [0, 0, 0, 1, 1, 1])


def test_gcn_jit_no_recompile_across_batches(rng):
    obj_vecs, pred_vecs, edges, om, tm = make_graph(rng)
    layer = GraphTripleConv(input_dim_obj=16, input_dim_pred=16, hidden_dim=32)
    params = layer.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges, om, tm)

    @jax.jit
    def run(p, ov, pv, e, m1, m2):
        return layer.apply(p, ov, pv, e, m1, m2)

    run(params, obj_vecs, pred_vecs, edges, om, tm)
    n0 = run._cache_size()
    obj2 = rng.randn(*obj_vecs.shape).astype(np.float32)
    run(params, obj2, pred_vecs, edges, om, tm)
    assert run._cache_size() == n0
