"""Fused GroupNorm kernel tests (CPU: reference path + predicates; TPU-gated
numeric check runs when a TPU is the active platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commonscenes_tpu.ops import groupnorm as gn


def test_supported_predicate():
    assert gn.fused_supported((4, 16, 16, 16, 224), 32)   # UNet L0
    assert gn.fused_supported((2, 16, 8, 8, 448), 32)
    assert gn.fused_supported((2, 16, 4, 4, 672), 32)
    assert not gn.fused_supported((2, 8, 8, 8, 30), 32)   # C % groups
    assert not gn.fused_supported((2, 4, 4, 4, 64), 32)   # C < 128


def test_reference_impl_matches_module_math(rng):
    """The kernel's reference path must equal the module's fp32 GN."""
    from commonscenes_tpu.nn.attention import GroupNorm
    x = jnp.asarray(rng.randn(2, 4, 4, 4, 64).astype(np.float32))
    m = GroupNorm(num_groups=32, silu=True)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)   # CPU → reference path with fused silu
    want = gn._reference_impl(x, v["params"]["scale"], v["params"]["bias"],
                              32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_silu_flag_changes_output(rng):
    from commonscenes_tpu.nn.attention import GroupNorm
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 64).astype(np.float32))
    m0 = GroupNorm(num_groups=32, silu=False)
    m1 = GroupNorm(num_groups=32, silu=True)
    v = m0.init(jax.random.PRNGKey(0), x)
    a = m0.apply(v, x)
    b = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray(jax.nn.silu(a.astype(jnp.float32))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not gn.on_tpu(), reason="needs a TPU")
def test_fused_matches_reference_on_tpu(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 224).astype(np.float32))
    s = jnp.ones((224,))
    b = jnp.zeros((224,))
    got = gn.fused_group_norm(x, s, b, 32, 1e-6, True)
    want = gn._reference_impl(x, s, b, 32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
