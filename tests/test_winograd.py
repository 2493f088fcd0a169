"""Winograd 3D conv vs direct conv (reference res-block conv shapes:
openai_model_3d.py:202-315 — stride-1 SAME 3x3x3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commonscenes_tpu.nn.conv3d import conv3d
from commonscenes_tpu.ops import winograd as wg


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _rand(shape, rng, scale=1.0):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["f2", "f4"])
@pytest.mark.parametrize("shape", [
    (2, 4, 4, 4, 5, 7),        # B, D, H, W, Cin, Cout (f2+f4 both tile 4)
    (1, 8, 4, 8, 3, 6),
])
def test_winograd_fp32_matches_direct(variant, shape):
    B, D, H, W, Ci, Co = shape
    rng = np.random.RandomState(0)
    x = _rand((B, D, H, W, Ci), rng)
    k = _rand((3, 3, 3, Ci, Co), rng, 0.2)
    out = wg.conv3d_winograd(x, k, variant=variant)
    ref = _direct(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.fast
def test_winograd_support_gates():
    ok = ((1, 1), (1, 1), (1, 1))
    k32 = (3, 3, 3, 32, 32)
    assert not wg.supports((1, 6, 6, 6, 32), k32,
                           (1, 1, 1), ok, "f4")       # 6 % 4 != 0
    assert wg.supports((1, 6, 6, 6, 32), k32, (1, 1, 1), ok, "f2")
    assert not wg.supports((1, 8, 8, 8, 32), k32,
                           (2, 2, 2), ok, "f2")        # strided
    assert not wg.supports((1, 8, 8, 8, 32), (1, 1, 1, 32, 32),
                           (1, 1, 1), ok, "f2")        # 1x1x1
    assert not wg.supports((1, 8, 8, 8, 32), k32, (1, 1, 1),
                           ((0, 0), (1, 1), (1, 1)), "f2")  # VALID depth
    assert not wg.supports((1, 2, 4, 4, 32), k32,
                           (1, 1, 1), ok, "f4")        # dim < tile
    assert not wg.supports((1, 8, 8, 8, 3), (3, 3, 3, 3, 32),
                           (1, 1, 1), ok, "f2")        # tiny Cin (conv_in)
    assert not wg.supports((1, 8, 8, 8, 32), (3, 3, 3, 32, 3),
                           (1, 1, 1), ok, "f2")        # tiny Cout (conv_out)


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["f2", "f4"])
def test_winograd_bf16_error_comparable_to_direct(variant, monkeypatch):
    # pin the default fp32 stage buffers: the ratios below are measured
    # for that configuration (COMMONSCENES_WINO_DTYPE=bf16 trades ~0.6x
    # more f2 error for half the transform traffic, and pushes f4 — which
    # is non-deployable either way — past its ceiling)
    monkeypatch.setenv("COMMONSCENES_WINO_DTYPE", "fp32")
    """bf16 Winograd error vs the fp32 truth must stay within a small
    multiple of direct bf16 conv's own rounding (the sampling path runs
    bf16 everywhere)."""
    rng = np.random.RandomState(1)
    B, D, H, W, Ci, Co = 2, 8, 4, 4, 64, 48
    x = _rand((B, D, H, W, Ci), rng)
    k = _rand((3, 3, 3, Ci, Co), rng, 1.0 / np.sqrt(27 * Ci))
    truth = np.asarray(_direct(x, k))
    scale = np.abs(truth).mean()

    xb, kb = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    err_direct = np.abs(
        np.asarray(_direct(xb, kb)).astype(np.float32) - truth).mean()
    err_wino = np.abs(
        np.asarray(wg.conv3d_winograd(xb, kb, variant=variant))
        .astype(np.float32) - truth).mean()
    # f2 measures ~2.2x direct bf16 rounding (deployable); f4 measures
    # ~21x at the standard points — documented as NOT bf16-deployable
    # (ops/winograd.py module docstring), pinned here so a regression or
    # an improvement both surface.
    limit = 3.0 if variant == "f2" else 30.0
    assert err_wino < limit * err_direct + 1e-3 * scale, \
        (err_wino, err_direct, scale)
    if variant == "f4":
        assert err_wino > 5.0 * err_direct, \
            "f4 bf16 improved — consider enabling (update winograd.py docs)"


@pytest.mark.fast
def test_winograd_grad_flows():
    rng = np.random.RandomState(2)
    x = _rand((1, 4, 4, 4, 4), rng)
    k = _rand((3, 3, 3, 4, 4), rng, 0.2)

    def loss_w(xx, kk):
        return jnp.sum(wg.conv3d_winograd(xx, kk, variant="f2") ** 2)

    def loss_d(xx, kk):
        return jnp.sum(_direct(xx, kk) ** 2)

    gw = jax.grad(loss_w, argnums=(0, 1))(x, k)
    gd = jax.grad(loss_d, argnums=(0, 1))(x, k)
    for a, b in zip(gw, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.fast
def test_conv3d_dispatch_env_gate(monkeypatch):
    rng = np.random.RandomState(3)
    x = _rand((1, 4, 4, 4, 32), rng)
    k = _rand((3, 3, 3, 32, 32), rng, 0.1)
    monkeypatch.setenv("COMMONSCENES_CONV_WINO", "f2")
    out = conv3d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_direct(x, k)),
                               rtol=2e-4, atol=2e-4)
    # unsupported geometry falls back to direct (odd spatial dim)
    x5 = _rand((1, 5, 5, 5, 32), rng)
    out5 = conv3d(x5, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)))
    np.testing.assert_allclose(
        np.asarray(out5),
        np.asarray(jax.lax.conv_general_dilated(
            x5, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))),
        rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_wino_inference_scope_gate(monkeypatch):
    """COMMONSCENES_CONV_WINO_SCOPE=inference enables Winograd only inside
    an inference_trace(True) region (UNet3D sets it when inference=True)."""
    from commonscenes_tpu.nn import conv3d as c3
    from commonscenes_tpu.ops import winograd as wg

    calls = []
    real = wg.conv3d_winograd

    def spy(x, k, variant="f2"):
        calls.append(variant)
        return real(x, k, variant=variant)

    monkeypatch.setattr(wg, "conv3d_winograd", spy)
    monkeypatch.setenv("COMMONSCENES_CONV_WINO", "f2")
    monkeypatch.setenv("COMMONSCENES_CONV_WINO_SCOPE", "inference")

    rng = np.random.RandomState(5)
    x = _rand((1, 4, 4, 4, 32), rng)
    k = _rand((3, 3, 3, 32, 32), rng, 0.1)

    conv3d(x, k)                       # training-style trace: gated OFF
    assert calls == []
    with c3.inference_trace(True):
        out = conv3d(x, k)             # sampling trace: Winograd ON
    assert calls == ["f2"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(_direct(x, k)),
                               rtol=2e-4, atol=2e-4)
    # flag restored after the with-block
    conv3d(x, k)
    assert calls == ["f2"]
    # scope=all (default) ignores the trace flag
    monkeypatch.setenv("COMMONSCENES_CONV_WINO_SCOPE", "all")
    conv3d(x, k)
    assert calls == ["f2", "f2"]


@pytest.mark.fast
def test_wino_min_hw_gate(monkeypatch):
    from commonscenes_tpu.ops import winograd as wg

    calls = []
    real = wg.conv3d_winograd

    def spy(x, k, variant="f2"):
        calls.append(x.shape[2] * x.shape[3])
        return real(x, k, variant=variant)

    monkeypatch.setattr(wg, "conv3d_winograd", spy)
    monkeypatch.setenv("COMMONSCENES_CONV_WINO", "f2")
    monkeypatch.setenv("COMMONSCENES_WINO_MIN_HW", "17")

    rng = np.random.RandomState(7)
    k = _rand((3, 3, 3, 32, 32), rng, 0.1)
    conv3d(_rand((1, 4, 4, 4, 32), rng), k)      # H*W = 16 < 17: direct
    assert calls == []
    conv3d(_rand((1, 4, 8, 8, 32), rng), k)      # H*W = 64: Winograd
    assert calls == [64]
