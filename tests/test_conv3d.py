"""Conv3D (depth-tap 2D-sum lowering) equivalence vs lax 3D conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.nn.conv3d import Conv3D, conv3d_2dsum


def ref_conv3d(x, k, strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, strides, list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("strides,pads", [
    ((1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ((1, 2, 2), ((1, 1), (1, 1), (1, 1))),   # UNet downsample
    ((2, 2, 2), ((0, 0), (0, 0), (0, 0))),   # VQ-VAE asym (pad done outside)
])
def test_conv3d_matches_reference(rng, strides, pads):
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.1)
    if strides == (2, 2, 2):
        xin = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    else:
        xin = x
    got = conv3d_2dsum(xin, k, strides, pads)
    want = ref_conv3d(xin, k, strides, pads)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_module_param_layout(rng):
    """Parameter pytree must match nn.Conv (kernel [3,3,3,Cin,Cout], bias)."""
    x = jnp.zeros((1, 4, 4, 4, 2))
    m = Conv3D(5, (3, 3, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 3, 2, 5)
    assert v["params"]["bias"].shape == (5,)

    import flax.linen as nn
    ref = nn.Conv(5, kernel_size=(3, 3, 3), padding=1)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # identical param trees → checkpoints interchange: the SAME input
    # through both modules must give the same values, not just shapes
    xin = jnp.asarray(rng.randn(1, 4, 4, 4, 2).astype(np.float32))
    got = m.apply({"params": vr["params"]}, xin)
    want = ref.apply(vr, xin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_gradients(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 2).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 2, 3).astype(np.float32) * 0.1)

    def f2d(k_):
        return jnp.sum(conv3d_2dsum(x, k_) ** 2)

    def f3d(k_):
        return jnp.sum(ref_conv3d(x, k_) ** 2)

    g2d = jax.grad(f2d)(k)
    g3d = jax.grad(f3d)(k)
    np.testing.assert_allclose(np.asarray(g2d), np.asarray(g3d),
                               rtol=1e-3, atol=1e-4)

    gx2d = jax.grad(lambda x_: jnp.sum(conv3d_2dsum(x_, k) ** 2))(x)
    gx3d = jax.grad(lambda x_: jnp.sum(ref_conv3d(x_, k) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx2d), np.asarray(gx3d),
                               rtol=1e-3, atol=1e-4)


def test_conv3d_bf16_dtype():
    x = jnp.zeros((1, 4, 4, 4, 2), jnp.float32)
    m = Conv3D(4, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.dtype == jnp.bfloat16
    # params stay fp32
    assert v["params"]["kernel"].dtype == jnp.float32


def test_upsample_parity_decomposition(rng, monkeypatch):
    """UpsampleHW's parity decomposition (four [3,2,2] coarse convs with
    pre-summed weights) is numerically identical to the materialized
    nearest-2x-then-3^3-conv path, including zero-padding borders, at
    12/27 of the MACs."""
    import jax
    import jax.numpy as jnp
    from commonscenes_tpu.nn.unet3d import UpsampleHW

    x = jnp.asarray(rng.randn(2, 4, 5, 6, 16), jnp.float32)
    m = UpsampleHW(channels=24)
    monkeypatch.setenv("COMMONSCENES_UPSAMPLE", "naive")
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    monkeypatch.setenv("COMMONSCENES_UPSAMPLE", "parity")
    out = m.apply(v, x)          # same params: identical tree either path
    assert out.shape == (2, 4, 10, 12, 24)
    import numpy as np
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
