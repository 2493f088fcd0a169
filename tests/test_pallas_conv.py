"""Pallas tap-accumulate conv3d (ops/pallas_conv3d.py): numeric
equivalence vs the XLA lowerings (interpret mode on the CPU test mesh),
VJP parity, and the VMEM block-size model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.nn.conv3d import conv3d_2dsum
from commonscenes_tpu.ops.pallas_conv3d import (_conv3d_pallas_impl,
                                                _pick_batch_block,
                                                conv3d_pallas, supports)


@pytest.mark.fast
@pytest.mark.parametrize("shape,cout", [
    ((2, 4, 4, 4, 16), 16),
    ((4, 6, 4, 4, 8), 24),     # Cin != Cout, D != H
    ((1, 3, 5, 2, 4), 4),      # odd spatial dims
])
def test_pallas_conv_matches_xla(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, shape[-1], cout)
                    .astype(np.float32) * 0.1)
    ref = conv3d_2dsum(x, k)
    out = _conv3d_pallas_impl(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_pallas_conv_vjp_matches_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 4, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype(np.float32) * 0.1)

    def loss_p(x, k):
        return jnp.sum(conv3d_pallas(x, k) ** 2)

    def loss_r(x, k):
        return jnp.sum(conv3d_2dsum(x, k) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, k)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_vmem_block_model():
    """The UNet's small-spatial operating points fit; the 16³ stage (which
    measured 17.1 MB of scoped VMEM under a naive budget) does not."""
    assert _pick_batch_block(32, 16, 8, 8, 448, 448) is not None
    assert _pick_batch_block(32, 16, 4, 4, 672, 672) is not None
    assert _pick_batch_block(32, 16, 16, 16, 224, 224) is None
    assert supports((32, 16, 8, 8, 448), (3, 3, 3, 448, 448),
                    (1, 1, 1), ((1, 1), (1, 1), (1, 1)))
    # wrong kernel geometry → unsupported
    assert not supports((32, 16, 8, 8, 448), (1, 1, 1, 448, 448),
                        (1, 1, 1), ((0, 0), (0, 0), (0, 0)))
    assert not supports((32, 16, 8, 8, 448), (3, 3, 3, 448, 448),
                        (2, 2, 2), ((1, 1), (1, 1), (1, 1)))
