"""SPMD tests: data-parallel train step over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                            replicate_tree, shard_batch)


@pytest.mark.fast
def test_mesh_and_sharding_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    x = np.zeros((16, 4), np.float32)
    sharded = shard_batch(mesh, {"a": x, "b": np.zeros((3,), np.float32),
                                 "c": None})
    assert sharded["a"].sharding.is_equivalent_to(batch_sharding(mesh), 2)
    # non-divisible leading dim → replicated
    assert sharded["b"].sharding.is_fully_replicated
    assert sharded["c"] is None


@pytest.mark.fast
def test_psum_over_mesh():
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.arange(8, dtype=np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    assert float(total(xs)) == 28.0


def test_dp_layout_step_matches_single_device():
    """Cheap DP numerical-parity test that runs by default: the layout-only
    (with_shapes=False) train step on 8 sharded scenes must produce the same
    metrics as the replicated single-device step."""
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    cfg = tiny_cfg()
    cfg = cfg.replace(batch=cfg.batch.__class__(
        batch_size=8, max_objs=10, max_triples=48, diffusion_bs=8,
        sdf_res=16))
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=False)
    batch = make_batch(cfg)
    batch = batch.replace(shapes=None)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    _, metrics_single = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    with mesh:
        state_r = replicate_tree(mesh, state)
        batch_s = shard_batch(mesh, batch)
        _, metrics_dp = trainer.train_step(state_r, batch_s,
                                           jax.random.PRNGKey(1))

    for k in metrics_single:
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_dp[k]), rtol=5e-3, atol=1e-4,
                                   err_msg=f"metric {k} differs under DP")


@pytest.mark.slow
@pytest.mark.skipif("not __import__('os').environ.get('RUN_SLOW_TESTS')",
                    reason="compile-heavy; set RUN_SLOW_TESTS=1")
def test_dp_train_step_matches_single_device():
    """The data-parallel step must produce identical metrics to the
    replicated single-device step (same batch, same rng)."""
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    cfg = tiny_cfg()
    # batch divisible by 8: 8 scenes, diffusion_bs 8
    cfg = cfg.replace(batch=cfg.batch.__class__(
        batch_size=8, max_objs=10, max_triples=48, diffusion_bs=8,
        sdf_res=16))
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    batch = make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    _, metrics_single = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    with mesh:
        state_r = replicate_tree(mesh, state)
        batch_s = shard_batch(mesh, batch)
        _, metrics_dp = trainer.train_step(state_r, batch_s,
                                           jax.random.PRNGKey(1))

    for k in metrics_single:
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_dp[k]), rtol=5e-3, atol=1e-4,
                                   err_msg=f"metric {k} differs under DP")
