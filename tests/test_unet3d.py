"""Shape/structure tests for the 3D denoiser UNet (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from commonscenes_tpu.core.config import UNetConfig
from commonscenes_tpu.nn.unet3d import ConditionedDenoiser, UNet3D, timestep_embedding

TINY = UNetConfig(image_size=8, in_channels=2, out_channels=2,
                  model_channels=32, num_res_blocks=1,
                  attention_resolutions=(2,), channel_mult=(1, 2),
                  num_heads=4, context_dim=16, use_checkpoint=False)


def test_timestep_embedding_cos_first():
    emb = timestep_embedding(jnp.array([0.0]), 8)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)


def test_unet_forward_shape():
    model = UNet3D(TINY)
    x = jnp.zeros((2, 8, 8, 8, 2))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jnp.zeros((2, 1, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 8, 2)
    assert out.dtype == jnp.float32


def test_unet_depth_preserving_downsample():
    """Depth axis must stay fixed while H/W halve (reference stride (1,2,2))."""
    captured = {}
    model = UNet3D(TINY)
    x = jnp.zeros((1, 8, 8, 8, 2))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    # inspect downsample conv kernel strides indirectly: run with a non-cubic
    # input and confirm output shape keeps depth
    x2 = jnp.zeros((1, 8, 16, 16, 2))
    out = model.apply(params, x2, t, ctx)
    assert out.shape == (1, 8, 16, 16, 2)


def test_zero_init_output_at_init():
    model = UNet3D(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 2))
    t = jnp.array([10], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_conditioned_denoiser_concat():
    cfg = UNetConfig(image_size=4, in_channels=2 + 1, out_channels=2,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2),
                     num_heads=4, context_dim=None, use_checkpoint=False,
                     use_spatial_transformer=False)
    model = ConditionedDenoiser(cfg, conditioning_key="concat")
    x = jnp.zeros((2, 4, 4, 4, 2))
    cond = jnp.zeros((2, 4 * 4 * 4 * 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == (2, 4, 4, 4, 2)


def test_cross_attention_context_changes_output():
    model = UNet3D(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 2))
    t = jnp.array([10], jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, c1)
    # perturb params away from zero-init so output is context sensitive
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(4), p.shape),
        params)
    o1 = model.apply(params, x, t, c1)
    o2 = model.apply(params, x, t, c2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_cfg_pair_matches_naive_doubled_batch():
    """The CFG-deduped forward (shared context-free prefix, cfg_pair=True)
    must equal running the naive 2K batch exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from commonscenes_tpu.core.config import UNetConfig
    from commonscenes_tpu.nn.unet3d import UNet3D

    cfg = UNetConfig(image_size=8, in_channels=3, out_channels=3,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, context_dim=16, use_checkpoint=False)
    m = UNet3D(cfg)
    rng = np.random.RandomState(0)
    K = 3
    x = jnp.asarray(rng.randn(K, 8, 8, 8, 3), jnp.float32)
    t = jnp.asarray([5, 9, 13], jnp.int32)
    uncond = jnp.asarray(rng.randn(K, 2, 16), jnp.float32)
    cond = jnp.asarray(rng.randn(K, 2, 16), jnp.float32)
    c_full = jnp.concatenate([uncond, cond], axis=0)

    v = m.init(jax.random.PRNGKey(0), x, t, cond)
    naive = m.apply(v, jnp.concatenate([x, x], 0),
                    jnp.concatenate([t, t], 0), c_full)
    dedup = m.apply(v, x, t, c_full, cfg_pair=True)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(naive),
                               rtol=1e-5, atol=1e-6)

    # the decoder skip-split (context-free skip halves computed once at K;
    # OFF by default since round 4 — measured to lose end-to-end) must
    # agree with the default tiled path — patch the env var so any
    # pre-existing export is restored afterwards (a bare del clobbered it)
    from unittest import mock
    import os
    with mock.patch.dict(os.environ, {"COMMONSCENES_SKIP_SPLIT": "1"}):
        split = m.apply(v, x, t, c_full, cfg_pair=True)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(split),
                               rtol=1e-5, atol=1e-6)


def test_skip_split_support_reference_widths():
    """Group boundaries align for the 16³ decoder blocks (448 = 2×224,
    group size 14); the level-transition widths straddle one group but
    still split their pure-skip groups (span case)."""
    from commonscenes_tpu.nn.unet3d import skip_split_supported
    assert skip_split_supported(224, 224, 224)          # aligned
    assert skip_split_supported(448, 448, 448)          # aligned (28/group)
    assert skip_split_supported(448, 224, 448)          # span: 672, group 21
    assert skip_split_supported(672, 448, 672)          # span: 1120, group 35
    assert not skip_split_supported(32, 32, 64)         # residual proj absent
    assert not skip_split_supported(127, 2, 64)         # no pure-skip group


def test_flops_accounting_dedup_and_split():
    """The analytic FLOP model: naive 2K > CFG-dedup, and the skip-split
    contribution equals its closed form at the reference widths. Four
    decoder blocks consume context-free skips: the level-1 third block and
    the level-0 first block are span cases (672 in, group 21 straddles the
    seam → 210 of 224 skip channels split out), the last two 16³ blocks
    (224+224) are aligned. The residual projection splits fully in all
    four (it needs no statistics)."""
    import commonscenes_tpu.nn.unet3d as u3
    from commonscenes_tpu.core.config import UNetConfig as UC
    from commonscenes_tpu.utils.flops import unet_forward_flops
    from unittest import mock
    import os
    cfg = UC()  # reference sdfusion-txt2shape operating point
    K = 8
    # the accounting mirrors the runtime knob (split OFF by default since
    # round 4) — pin it ON here to check the split term's closed form
    with mock.patch.dict(os.environ, {"COMMONSCENES_SKIP_SPLIT": "1"}):
        naive = unet_forward_flops(cfg, 2 * K)
        dedup = unet_forward_flops(cfg, 2 * K, cfg_pair_base=K)
        assert dedup < naive

        orig = u3.skip_split_supported
        u3.skip_split_supported = lambda *a: False
        try:
            dedup_nosplit = unet_forward_flops(cfg, 2 * K,
                                               cfg_pair_base=K)
        finally:
            u3.skip_split_supported = orig
    # with the knob at its default (off), the split term vanishes
    assert unet_forward_flops(cfg, 2 * K, cfg_pair_base=K) == dedup_nosplit
    vox = cfg.image_size ** 3
    mc = cfg.model_channels

    def save(vox, cout, pure_sk, sch):
        # skip-side conv1 (pure-skip channels) and residual projection
        # (whole skip) run at K instead of 2K: half their cost
        return 0.5 * (2.0 * 27 * vox * pure_sk * cout
                      + 2.0 * vox * sch * cout)

    expected = (save(vox // 4, 2 * mc, 210, mc)      # L1 third (span)
                + save(vox, mc, 210, mc)             # L0 first (span)
                + 2 * save(vox, mc, mc, mc)) * (2 * K)  # L0 aligned ×2
    np.testing.assert_allclose(dedup_nosplit - dedup, expected, rtol=1e-9)


def test_unet_winograd_matches_direct():
    """Whole-UNet parity for the Winograd conv lowering, through the real
    dispatch (incl. the skip-split res blocks' channel-sliced convs and the
    inference-scope/cfg-pair paths) — op-level parity tests can't catch a
    wrong dispatch inside the split blocks."""
    import os
    from unittest import mock

    import jax
    import jax.numpy as jnp
    import numpy as np
    from commonscenes_tpu.core.config import UNetConfig
    from commonscenes_tpu.nn.unet3d import UNet3D

    cfg = UNetConfig(image_size=8, in_channels=3, out_channels=3,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, context_dim=16, use_checkpoint=False)
    m = UNet3D(cfg)
    rng = np.random.RandomState(1)
    K = 2
    x = jnp.asarray(rng.randn(K, 8, 8, 8, 3), jnp.float32)
    t = jnp.asarray([5, 9], jnp.int32)
    c_full = jnp.asarray(rng.randn(2 * K, 2, 16), jnp.float32)

    v = m.init(jax.random.PRNGKey(0), x, t, c_full[K:])
    base = m.apply(v, x, t, c_full, cfg_pair=True, inference=True)
    # XLA f2 variants only: the fused Pallas kernel has its own op-level
    # parity suite, and its interpret-mode run over a whole UNet costs
    # minutes on the 1-core host
    for knobs in ({"COMMONSCENES_CONV_WINO": "f2"},
                  {"COMMONSCENES_CONV_WINO": "f2",
                   "COMMONSCENES_CONV_WINO_SCOPE": "inference"}):
        with mock.patch.dict(os.environ, knobs):
            got = m.apply(v, x, t, c_full, cfg_pair=True, inference=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=str(knobs))
