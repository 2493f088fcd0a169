"""Fused Pallas Winograd conv vs direct conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commonscenes_tpu.ops import pallas_winograd as pw


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _rand(shape, rng, scale=1.0):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


# the three UNet stage geometries (D kept at 16, HW halved per level) plus
# an odd batch that exercises the b_blk padding path
@pytest.mark.parametrize("shape", [
    (2, 16, 16, 16, 12, 8),     # L0-like
    (2, 16, 8, 8, 16, 12),      # L1-like
    (3, 16, 4, 4, 16, 8),       # L2-like, odd batch
    (1, 4, 4, 4, 5, 7),         # minimal volume, ragged channels
])
def test_fused_winograd_matches_direct(shape):
    B, D, H, W, Ci, Co = shape
    rng = np.random.RandomState(0)
    x = _rand((B, D, H, W, Ci), rng)
    k = _rand((3, 3, 3, Ci, Co), rng, 0.2)
    out = pw.conv3d_winograd_fused(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_direct(x, k)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.fast
def test_fused_winograd_grad_is_reference_vjp():
    rng = np.random.RandomState(1)
    x = _rand((1, 4, 4, 4, 4), rng)
    k = _rand((3, 3, 3, 4, 4), rng, 0.2)
    gw = jax.grad(lambda a, b: jnp.sum(pw.conv3d_winograd_fused(a, b) ** 2),
                  argnums=(0, 1))(x, k)
    gd = jax.grad(lambda a, b: jnp.sum(_direct(a, b) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b in zip(gw, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.fast
def test_fused_winograd_support_gates():
    ok = ((1, 1), (1, 1), (1, 1))
    k32 = (3, 3, 3, 32, 32)
    assert pw.supports((1, 4, 4, 4, 32), k32, (1, 1, 1), ok)
    assert not pw.supports((1, 5, 4, 4, 32), k32, (1, 1, 1), ok)
    assert not pw.supports((1, 4, 4, 4, 32), k32, (2, 2, 2), ok)
    assert not pw.supports((1, 4, 4, 4, 32), (1, 1, 1, 32, 32),
                           (1, 1, 1), ok)
    assert not pw.supports((1, 4, 4, 4, 3), (3, 3, 3, 3, 32),
                           (1, 1, 1), ok)       # tiny Cin
    assert not pw.supports((1, 4, 4, 4, 32), (3, 3, 3, 32, 3),
                           (1, 1, 1), ok)       # tiny Cout


def test_fused_winograd_bf16():
    """bf16 path: error must stay within the XLA f2 winograd profile."""
    from commonscenes_tpu.ops import winograd as wg
    rng = np.random.RandomState(2)
    B, D, H, W, Ci, Co = 2, 8, 4, 4, 64, 48
    x = _rand((B, D, H, W, Ci), rng)
    k = _rand((3, 3, 3, Ci, Co), rng, 1.0 / np.sqrt(27 * Ci))
    truth = np.asarray(_direct(x, k))
    xb, kb = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    err_d = np.abs(np.asarray(_direct(xb, kb)).astype(np.float32)
                   - truth).mean()
    err_f = np.abs(np.asarray(pw.conv3d_winograd_fused(xb, kb))
                   .astype(np.float32) - truth).mean()
    scale = np.abs(truth).mean()
    assert err_f < 3.5 * err_d + 1e-3 * scale, (err_f, err_d)


@pytest.mark.fast
def test_planner_real_geometries():
    """Real-geometry plans must obey the Mosaic lowering constraint — the
    Cout block is a lane multiple (128) or spans the whole axis — or the
    planner must return None so dispatch falls back (a 224-wide Co block
    on a 448 axis was REJECTED at compile time on v5e, ABRESULTS_r04
    winograd_pallas rc=1). Plannable stages still get a full 128-row
    matmul block and a >=112-lane Cout block."""
    cases = {
        (18, 16, 16, 16, 224, 224): True,    # L0
        (18, 16, 16, 16, 448, 224): True,    # L0 skip-concat
        (18, 16, 8, 8, 448, 448): True,      # L1
        (18, 16, 4, 4, 672, 672): False,     # L2: no Mosaic-legal block
        (18, 16, 8, 8, 672, 448): True,      # L1 upsample-in
        (8, 64, 64, 64, 128, 128): True,     # VQ-VAE decode
    }
    for (B, D, H, W, Ci, Co), plannable in cases.items():
        r = pw._plan_split(B, D, H, W, Ci, Co)
        if not plannable:
            assert r is None, (B, D, H, W, Ci, Co, r)
            # and the dispatch gate must say no, so conv3d falls back
            assert not pw.supports((B, D, H, W, Ci), (3, 3, 3, Ci, Co),
                                   (1, 1, 1), ((1, 1), (1, 1), (1, 1)))
            continue
        assert r is not None, (B, D, H, W, Ci, Co)
        nsplit, (b_blk, T_cd, co) = r
        rows = b_blk * T_cd * (H // 2) * (W // 2)
        # the wide-Cin 672->448 stage can only afford a half row block once
        # its Co block must span the full 448 axis (VMEM); all others keep
        # the full 128
        min_rows = 64 if Ci == 672 else 128
        assert rows >= min_rows, (rows, (B, D, H, W, Ci, Co))
        assert co >= 112, (co, (B, D, H, W, Ci, Co))
        assert co == Co or co % 128 == 0, (co, Co)
        assert Ci % nsplit == 0


@pytest.mark.fast
def test_conv3d_dispatch_pallas_gate(monkeypatch):
    from commonscenes_tpu.nn.conv3d import conv3d
    rng = np.random.RandomState(3)
    x = _rand((1, 4, 4, 4, 32), rng)
    k = _rand((3, 3, 3, 32, 32), rng, 0.1)
    monkeypatch.setenv("COMMONSCENES_CONV_WINO", "pallas")
    np.testing.assert_allclose(np.asarray(conv3d(x, k)),
                               np.asarray(_direct(x, k)),
                               rtol=2e-4, atol=2e-4)
    # unsupported geometry falls through to the XLA f2 path, then direct
    x5 = _rand((1, 5, 5, 5, 32), rng)
    np.testing.assert_allclose(
        np.asarray(conv3d(x5, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)))),
        np.asarray(_direct(x5, k)), rtol=1e-5, atol=1e-5)
