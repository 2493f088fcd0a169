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


def test_dp_train_step_matches_single_device():
    """The FULL (with_shapes=True) data-parallel step must produce identical
    metrics to the replicated single-device step (same batch, same rng).
    Runs in the default tier: the diffusion/VQ-VAE branch is shrunk to a
    micro operating point (8³ SDFs, 4³ latents, 16-ch UNet) so the whole
    test compiles + runs in well under a minute on the 1-core host while
    still exercising every collective of the shape branch."""
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.train.step_v2full import V2FullTrainer

    cfg = tiny_cfg()
    # batch divisible by 8: 8 scenes, diffusion_bs 8; micro shape branch
    cfg = cfg.replace(
        layout=cfg.layout.__class__(embedding_dim=8, gconv_num_layers=1,
                                    use_clip=True, clip_dim=32,
                                    mlp_normalization="batch",
                                    rel_hidden_crossattn=12,
                                    rel_out_crossattn=16),
        vqvae=cfg.vqvae.__class__(embed_dim=2, n_embed=8, z_channels=2,
                                  resolution=8, ch=4, ch_mult=(1, 2),
                                  num_res_blocks=1),
        unet=cfg.unet.__class__(image_size=4, in_channels=2, out_channels=2,
                                model_channels=8, num_res_blocks=1,
                                attention_resolutions=(2,),
                                channel_mult=(1, 2), num_heads=1,
                                context_dim=16, use_checkpoint=False),
        diffusion=cfg.diffusion.__class__(timesteps=20, ddim_steps=5),
        batch=cfg.batch.__class__(batch_size=8, max_objs=8, max_triples=32,
                                  diffusion_bs=8, sdf_res=8),
        # GAN branch off: its DP numerics are already proven by the default
        # layout test above; dropping the two extra grad-through-D programs
        # halves this test's compile time
        train=cfg.train.__class__(weight_d_box=0.0))
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    trainer = V2FullTrainer(cfg, model, with_shapes=True)
    batch = make_batch(cfg)
    # abstract init (jax.eval_shape: no compile — the real jitted init costs
    # ~70 s of XLA time on this host) + a deterministic non-degenerate fill;
    # parity only needs both executions to share the exact same state
    state_abs = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0),
                               batch)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state_abs)

    def _fill(i, path, s):
        name = jax.tree_util.keystr(path)
        if s.dtype in (jnp.int32, jnp.int64, jnp.uint32):
            return jnp.zeros(s.shape, s.dtype)
        # keystr renders dict keys as ['scale'] — match that form, so norm
        # scales/running vars really get the ones-fill (a randn fill gave
        # negative variances, and rsqrt(neg) NaNs would compare equal under
        # assert_allclose's equal_nan default, making parity vacuous)
        if name.endswith(("['scale']", "['var']")):
            return jnp.ones(s.shape, s.dtype)
        r = np.random.RandomState(i)
        return jnp.asarray(0.02 * r.randn(*s.shape), s.dtype)

    state = jax.tree_util.tree_unflatten(
        treedef, [_fill(i, p, s) for i, (p, s) in enumerate(leaves)])

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


def test_dp_v1full_step_matches_single_device():
    """v1_full data-parallel step parity: generator + shape-aux + box-D
    updates over 8 sharded scenes must match the replicated single-device
    step (same batch, same rng) — v1's GAN wiring has no other multi-device
    coverage."""
    from commonscenes_tpu.core.config import (BatchConfig, FullConfig,
                                              TrainConfig)
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import make_scene
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.v1_full import V1FullVAE
    from commonscenes_tpu.train.step_v1full import V1FullTrainer

    vocab = Vocab.synthetic()
    bcfg = BatchConfig(batch_size=8, max_objs=8, max_triples=32)
    cfg = FullConfig(network_type="v1_full", batch=bcfg, train=TrainConfig())
    model = V1FullVAE(num_obj_classes=vocab.num_obj_classes,
                      num_pred_classes=vocab.num_pred_classes,
                      embedding_dim=16, gconv_num_layers=1,
                      gconv_num_shared_layers=1, shape_input_dim=32)
    trainer = V1FullTrainer(cfg, model, vocab.num_obj_classes,
                            vocab.num_pred_classes)
    rng = np.random.RandomState(3)
    scenes = [make_scene(vocab, rng, num_objs=5, with_clip=False)
              for _ in range(8)]
    batch = collate(scenes, vocab, bcfg, rng, use_clip=False,
                    manipulation_modes=("relationship",))
    shapes_gt = jnp.asarray(rng.randn(8 * 8, 32).astype(np.float32))

    state = trainer.init_state(jax.random.PRNGKey(0), batch, shapes_gt)
    _, m_single = trainer.train_step(state, batch, shapes_gt,
                                     jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    with mesh:
        state_r = replicate_tree(mesh, state)
        batch_s = shard_batch(mesh, batch)
        shapes_s = jax.device_put(shapes_gt, batch_sharding(mesh))
        _, m_dp = trainer.train_step(state_r, batch_s, shapes_s,
                                     jax.random.PRNGKey(1))

    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]), float(m_dp[k]),
                                   rtol=5e-3, atol=1e-4,
                                   err_msg=f"metric {k} differs under DP")


def test_object_sharded_sampling_matches_unsharded():
    """Single-scene latency mode: sharding the packed shape-slot axis of the
    sampling program across the 8-device mesh must reproduce the unsharded
    output bit-for-bit (same key, same program semantics)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.eval.sampling import pack_slots
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full

    cfg = tiny_cfg()
    cfg = cfg.replace(batch=cfg.batch.__class__(
        batch_size=1, max_objs=10, max_triples=48, diffusion_bs=2,
        sdf_res=16))
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = {
        "layout": {"params": variables["layout"]["params"],
                   "batch_stats": variables["layout"]["batch_stats"]},
        "df": {"params": variables["df"]["params"]},
        "vqvae": {"params": variables["vqvae"]["params"]},
    }
    D = cfg.layout.box_embedding_dim + cfg.layout.angle_embedding_dim
    slots, n_real = pack_slots(batch.dec.objs, batch.dec.obj_mask,
                               VOCAB.scene_class_id, bucket=8)
    assert len(slots) % 8 == 0

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("data"))

    def run(slot_sharding):
        fn = jax.jit(lambda: model.sample(
            variables, batch.dec, jnp.zeros(D), jnp.eye(D),
            jax.random.PRNGKey(3), gen_shape=True,
            shape_slot_idx=jnp.asarray(slots),
            slot_sharding=slot_sharding))
        return fn()

    base = run(None)
    with mesh:
        sharded = run(sharding)
    np.testing.assert_allclose(np.asarray(sharded["boxes"]),
                               np.asarray(base["boxes"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sharded["sdf"][:n_real], np.float32),
        np.asarray(base["sdf"][:n_real], np.float32), atol=2e-2)
    # the sharded program really put the slot axis on the mesh
    assert not sharded["sdf"].sharding.is_fully_replicated


def test_object_sharded_sampling_uneven_K(monkeypatch):
    """Padded-slot sharding off the toy path: two scenes with DIFFERENT
    object counts (5 + 6 → n_real=11) pack to K=16 slots over the 8-device
    mesh — two slots per device, with the three pad slots landing mid-shard
    — and a forced decode chunk of 8 makes the chunked ``lax.map`` VQ-VAE
    decode (models/commonscenes.py:_decode_latents) run UNDER the slot
    sharding. Output must match the unsharded program (reference semantics
    protected: the serial mini-batch-of-7 sampling loop,
    sdfusion_txt2shape_model.py:493-511)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.test_train_step import tiny_cfg, VOCAB
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import make_scene
    from commonscenes_tpu.eval.sampling import pack_slots
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full

    monkeypatch.setenv("COMMONSCENES_DECODE_CHUNK", "8")
    cfg = tiny_cfg()
    cfg = cfg.replace(batch=cfg.batch.__class__(
        batch_size=2, max_objs=10, max_triples=48, diffusion_bs=2,
        sdf_res=16))
    rng = np.random.RandomState(7)
    scenes = [make_scene(VOCAB, rng, num_objs=n, sdf_res=16, clip_dim=32)
              for n in (5, 6)]
    batch = collate(scenes, VOCAB, cfg.batch, rng, clip_dim=32,
                    manipulation_modes=("addition", "relationship"),
                    with_shapes=True)
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = {
        "layout": {"params": variables["layout"]["params"],
                   "batch_stats": variables["layout"]["batch_stats"]},
        "df": {"params": variables["df"]["params"]},
        "vqvae": {"params": variables["vqvae"]["params"]},
    }
    D = cfg.layout.box_embedding_dim + cfg.layout.angle_embedding_dim
    slots, n_real = pack_slots(batch.dec.objs, batch.dec.obj_mask,
                               VOCAB.scene_class_id, bucket=8)
    assert n_real == 11 and len(slots) == 16  # uneven: K % n_real ≠ 0

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("data"))

    def run(slot_sharding):
        fn = jax.jit(lambda: model.sample(
            variables, batch.dec, jnp.zeros(D), jnp.eye(D),
            jax.random.PRNGKey(5), gen_shape=True,
            shape_slot_idx=jnp.asarray(slots),
            slot_sharding=slot_sharding))
        return fn()

    base = run(None)
    with mesh:
        sharded = run(sharding)
    np.testing.assert_allclose(np.asarray(sharded["boxes"]),
                               np.asarray(base["boxes"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sharded["sdf"][:n_real], np.float32),
        np.asarray(base["sdf"][:n_real], np.float32), atol=2e-2)
    assert not sharded["sdf"].sharding.is_fully_replicated
