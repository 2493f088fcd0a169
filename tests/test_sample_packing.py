"""Packed shape sampling: shapes only for selected slots."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train_step import VOCAB, make_batch, tiny_cfg
from commonscenes_tpu.models.commonscenes import CommonScenesV2Full


def test_sample_with_slot_packing():
    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    slots = jnp.asarray([1, 3, 5, 7], jnp.int32)
    out = model.sample(variables, batch.dec, jnp.zeros((16,)), jnp.eye(16),
                       jax.random.PRNGKey(1), gen_shape=True,
                       shape_slot_idx=slots)
    BN = cfg.batch.batch_size * cfg.batch.max_objs
    assert out["boxes"].shape == (BN, 6)       # layout still full batch
    assert out["sdf"].shape == (4, 16, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out["sdf"])))

    # packed output rows must equal the rows of an unpacked run at the
    # same slots (same key → same z; shared noise uses one x_T for all)
    out_full = model.sample(variables, batch.dec, jnp.zeros((16,)),
                            jnp.eye(16), jax.random.PRNGKey(1),
                            gen_shape=True)
    np.testing.assert_allclose(
        np.asarray(out["sdf"]),
        np.asarray(out_full["sdf"])[np.asarray(slots)], rtol=1e-3, atol=1e-4)


def test_decode_latents_chunks_any_K():
    """_decode_latents must chunk (and pad) for ANY K > max_chunk, and equal
    the direct decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tests.test_train_step import tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.nn.vqvae3d import VQVAE3D

    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    z_sp, zc = cfg.vqvae.z_spatial, cfg.vqvae.embed_dim
    rng = np.random.RandomState(0)
    K = 7  # not a multiple of the chunk
    samples = jnp.asarray(rng.randn(K, z_sp, z_sp, z_sp, zc), jnp.float32)
    vq_vars = model.vqvae.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 16, 1)))
    variables = {"vqvae": vq_vars}
    direct = model.vqvae.apply(vq_vars, samples,
                               method=VQVAE3D.decode_no_quant)
    chunked = model._decode_latents(variables, samples, max_chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)
    assert chunked.shape[0] == K


def test_sample_eta_noise_threaded():
    """With ddim_eta>0 the model's sampling chain must actually inject the
    sigma_t*noise term (reference ddim.py:241-243): samples under eta=1.0
    must differ from eta=0.0 for the same seed, and eta=0 must stay
    deterministic in the noise key's eta half."""
    import dataclasses

    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full

    cfg0 = tiny_cfg()
    cfg1 = cfg0.replace(diffusion=dataclasses.replace(
        cfg0.diffusion, ddim_eta=1.0))
    batch = make_batch(cfg0, seed=0)

    m0 = CommonScenesV2Full(cfg0, VOCAB.num_obj_classes,
                            VOCAB.num_pred_classes)
    variables = jax.jit(m0.init)(jax.random.PRNGKey(0), batch)
    m1 = CommonScenesV2Full(cfg1, VOCAB.num_obj_classes,
                            VOCAB.num_pred_classes)

    kwargs = dict(gen_shape=True)
    out0 = m0.sample(variables, batch.dec, jnp.zeros((16,)), jnp.eye(16),
                     jax.random.PRNGKey(3), **kwargs)
    out0b = m0.sample(variables, batch.dec, jnp.zeros((16,)), jnp.eye(16),
                      jax.random.PRNGKey(3), **kwargs)
    out1 = m1.sample(variables, batch.dec, jnp.zeros((16,)), jnp.eye(16),
                     jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_allclose(np.asarray(out0["sdf"]),
                               np.asarray(out0b["sdf"]))
    assert np.max(np.abs(np.asarray(out1["sdf"])
                         - np.asarray(out0["sdf"]))) > 1e-6, \
        "eta=1.0 sampling identical to eta=0 — sigma noise not injected"


def test_staged_sampling_equals_fused():
    """The staged layout/denoise/decode path (cli/eval_3dfront.py
    --staged_sample, via sample_layout + gen_latents + decode_latents) must
    reproduce model.sample bitwise — same key splits, same ops, only the
    jit boundaries differ."""
    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    mean_est, chol = jnp.zeros((16,)), jnp.eye(16)
    slots = jnp.asarray([1, 3, 5, 7], jnp.int32)
    key = jax.random.PRNGKey(7)

    fused = model.sample(variables, batch.dec, mean_est, chol, key,
                         gen_shape=True, shape_slot_idx=slots)

    k_z, k_noise = jax.random.split(key)
    lay = jax.jit(lambda d, k: model.sample_layout(
        variables, d, mean_est, chol, k))(batch.dec, k_z)
    lat = jax.jit(lambda uc, c, k, s: model.gen_latents(
        variables, uc, c, k, shape_slot_idx=s))(
        lay["uc_rel"], lay["c_rel"], k_noise, slots)
    sdf = jax.jit(lambda s: model.decode_latents(variables, s))(lat)

    # eager staged == fused is exact; across a jit boundary XLA fusion
    # reassociates low bits (measured max |Δ| 3.6e-7 on the boxes)
    np.testing.assert_allclose(np.asarray(fused["boxes"]),
                               np.asarray(lay["boxes"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["angles"]),
                               np.asarray(lay["angles"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["sdf"]), np.asarray(sdf),
                               rtol=1e-3, atol=1e-4)


def test_staged_manipulation_equals_fused():
    """Staged manipulate_layout + gen_latents + decode_latents must equal
    manipulate_sample (the --manipulation eval path)."""
    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)   # collated with manipulation modes
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    slots = jnp.asarray([1, 3, 5, 7], jnp.int32)
    key = jax.random.PRNGKey(11)

    fused = model.manipulate_sample(variables, batch, key, gen_shape=True,
                                    shape_slot_idx=slots)

    k_l, k_noise = jax.random.split(key)
    lay = jax.jit(lambda b, k: model.manipulate_layout(variables, b, k))(
        batch, k_l)
    lat = jax.jit(lambda uc, c, k, s: model.gen_latents(
        variables, uc, c, k, shape_slot_idx=s))(
        lay["uc_rel"], lay["c_rel"], k_noise, slots)
    sdf = jax.jit(lambda s: model.decode_latents(variables, s))(lat)

    np.testing.assert_allclose(np.asarray(fused["boxes"]),
                               np.asarray(lay["boxes"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["sdf"]), np.asarray(sdf),
                               rtol=1e-3, atol=1e-4)
