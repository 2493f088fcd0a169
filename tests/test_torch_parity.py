"""Golden numeric parity vs the importable PyTorch reference.

Each test instantiates REAL reference modules from /root/reference (torch,
CPU), converts their weights through train/checkpoints.py converters, and
asserts that the JAX twin produces the same outputs in fp32:

* GraphTripleConv[Net]         (reference model/graph.py:124-288)
* build_mlp / MaskedBatchNorm  (model/layers.py:21-38, eval mode)
* VQVAE encode/decode/quantize (model/networks/vqvae_networks/network.py)
* UNet3DModel forward          (openai_model_3d.py:452-789)
* DDIM p_sample_ddim + chain   (samplers/ddim.py:181-243 with CFG)
* calculate_model_losses       (model/losses.py:26-51)
* full Sg2ScVAEModel layout encoder/decoder via the merged-checkpoint
  importer (model/VAE.py:102-158 layout keys)
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

# openai_model_3d.py lazily imports omegaconf.listconfig.ListConfig only to
# type-check its context_dim arg; omegaconf isn't installed here, so provide
# a minimal stub (test-only shim, not used by the framework).
if "omegaconf" not in sys.modules:
    import types

    _lc = types.ModuleType("omegaconf.listconfig")

    class _ListConfig(list):
        pass

    _lc.ListConfig = _ListConfig
    _omega = types.ModuleType("omegaconf")
    _omega.listconfig = _lc
    sys.modules["omegaconf"] = _omega
    sys.modules["omegaconf.listconfig"] = _lc

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from commonscenes_tpu.train.checkpoints import (  # noqa: E402
    import_reference_gcn, import_reference_layout, import_reference_unet,
    import_reference_v2full_checkpoint, import_reference_vqvae,
    import_torch_mlp)

RTOL = 2e-4
ATOL = 2e-5


def t2n(t):
    return t.detach().cpu().numpy()


def tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


# ---------------------------------------------------------------------------
# build_mlp
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch_norm", ["none", "batch"])
def test_build_mlp_parity(batch_norm):
    from model.layers import build_mlp
    from commonscenes_tpu.nn.mlp import MLP

    torch.manual_seed(0)
    tmlp = build_mlp([12, 20, 8], batch_norm=batch_norm,
                     final_nonlinearity=False).eval()
    if batch_norm == "batch":
        # give the BN non-trivial running stats
        with torch.no_grad():
            tmlp.train()
            for _ in range(3):
                tmlp(torch.randn(32, 12))
            tmlp.eval()

    x = np.random.RandomState(1).randn(7, 12).astype(np.float32)
    ref = t2n(tmlp(torch.from_numpy(x)))

    sd = {k: t2n(v) for k, v in tmlp.state_dict().items()}
    params, stats = import_torch_mlp(sd, "")
    m = MLP((20, 8), batch_norm=batch_norm, final_nonlinearity=False)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# GraphTripleConvNet
# ---------------------------------------------------------------------------


def _random_graph(rng, n_obj, n_tri, d_obj, d_pred):
    obj = rng.randn(n_obj, d_obj).astype(np.float32)
    pred = rng.randn(n_tri, d_pred).astype(np.float32)
    edges = np.stack([rng.randint(0, n_obj, n_tri),
                      rng.randint(0, n_obj, n_tri)], axis=1).astype(np.int32)
    return obj, pred, edges


@pytest.mark.parametrize("pooling,residual,output_dim", [
    ("avg", True, 24),
    ("sum", False, None),
    ("wAvg", False, 24),
])
def test_graph_triple_conv_net_parity(pooling, residual, output_dim):
    from model.graph import GraphTripleConvNet as TorchGCN
    from commonscenes_tpu.nn.gcn import GraphTripleConvNet

    torch.manual_seed(0)
    kwargs = dict(input_dim_obj=32, input_dim_pred=32, num_layers=2,
                  hidden_dim=40, pooling=pooling, residual=residual,
                  mlp_normalization="none", output_dim=output_dim)
    tnet = TorchGCN(**kwargs).eval()

    rng = np.random.RandomState(2)
    obj, pred, edges = _random_graph(rng, 9, 14, 32, 32)
    with torch.no_grad():
        ref_obj, ref_pred = tnet(torch.from_numpy(obj),
                                 torch.from_numpy(pred),
                                 torch.from_numpy(edges).long())

    sd = {k: t2n(v) for k, v in tnet.state_dict().items()}
    params, _ = import_reference_gcn(sd, "", 2, pooling, residual)
    jnet = GraphTripleConvNet(input_dim_obj=32, input_dim_pred=32,
                              num_layers=2, hidden_dim=40, pooling=pooling,
                              residual=residual, output_dim=output_dim)
    # structure check against a fresh init
    init = jnet.init(jax.random.PRNGKey(0), jnp.asarray(obj),
                     jnp.asarray(pred), jnp.asarray(edges),
                     jnp.ones(9), jnp.ones(14))
    assert tree_paths(init["params"]) == tree_paths(params)

    out_obj, out_pred = jnet.apply({"params": params}, jnp.asarray(obj),
                                   jnp.asarray(pred), jnp.asarray(edges),
                                   jnp.ones(9), jnp.ones(14))
    np.testing.assert_allclose(np.asarray(out_obj), t2n(ref_obj),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_pred), t2n(ref_pred),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def _torch_vqvae(attn_resolutions=()):
    from model.networks.vqvae_networks.network import VQVAE
    ddconfig = dict(double_z=False, z_channels=3, resolution=16,
                    in_channels=1, out_ch=1, ch=8, ch_mult=[1, 2],
                    num_res_blocks=1,
                    attn_resolutions=list(attn_resolutions), dropout=0.0)
    torch.manual_seed(0)
    return VQVAE(ddconfig, n_embed=32, embed_dim=3).eval()


def _jax_vqvae(attn_resolutions=()):
    from commonscenes_tpu.core.config import VQVAEConfig
    from commonscenes_tpu.nn.vqvae3d import VQVAE3D
    cfg = VQVAEConfig(embed_dim=3, n_embed=32, z_channels=3, resolution=16,
                      ch=8, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=tuple(attn_resolutions))
    return VQVAE3D(cfg)


@pytest.mark.parametrize("attn_res", [(), (8,)])
def test_vqvae_parity(attn_res):
    # attn_res=(8,) exercises the per-level attention blocks
    # (vqvae_modules.py:225-227) and their importer mapping
    tvq = _torch_vqvae(attn_res)
    jvq = _jax_vqvae(attn_res)

    x = (np.random.RandomState(3).rand(2, 16, 16, 16, 1)
         .astype(np.float32) * 0.4 - 0.2)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NDHWC → NCDHW

    with torch.no_grad():
        ref_z = t2n(tvq.encode_no_quant(xt))            # [B, 3, 8, 8, 8]
        ref_quant, ref_emb_loss, _ = tvq.quantize(
            torch.from_numpy(ref_z), is_voxel=True)
        ref_dec = t2n(tvq.decode_no_quant(torch.from_numpy(ref_z)))

    init = jvq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_reference_vqvae(
        {k: v for k, v in tvq.state_dict().items()}, init["params"])

    z = np.asarray(jvq.apply({"params": params}, jnp.asarray(x),
                             method=jvq.encode_no_quant))
    np.testing.assert_allclose(z.transpose(0, 4, 1, 2, 3), ref_z,
                               rtol=RTOL, atol=ATOL)

    zq, emb_loss, _ = jvq.apply({"params": params}, jnp.asarray(z),
                                method=lambda m, zz: m.quantize(zz))
    np.testing.assert_allclose(
        np.asarray(zq).transpose(0, 4, 1, 2, 3), t2n(ref_quant),
        rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(float(emb_loss), float(ref_emb_loss),
                               rtol=1e-3, atol=1e-5)

    dec = np.asarray(jvq.apply({"params": params}, jnp.asarray(z),
                               method=jvq.decode_no_quant))
    np.testing.assert_allclose(dec.transpose(0, 4, 1, 2, 3), ref_dec,
                               rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# UNet3D
# ---------------------------------------------------------------------------

UNET_KW = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
               attention_resolutions=(2,), transformer_depth=1)


def _torch_unet(context_dim=40, in_ch=3, out_ch=3):
    from model.networks.diffusion_networks.openai_model_3d import UNet3DModel
    torch.manual_seed(0)
    return UNet3DModel(
        image_size=8, in_channels=in_ch, model_channels=32,
        out_channels=out_ch, num_res_blocks=1, attention_resolutions=[2],
        channel_mult=(1, 2), dims=3, num_heads=4,
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=context_dim, use_checkpoint=False, legacy=True).eval()


def _jax_unet(context_dim=40, in_ch=3, out_ch=3):
    from commonscenes_tpu.core.config import UNetConfig
    from commonscenes_tpu.nn.unet3d import UNet3D
    cfg = UNetConfig(image_size=8, in_channels=in_ch, out_channels=out_ch,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, context_dim=context_dim,
                     use_checkpoint=False)
    return UNet3D(cfg)


@pytest.fixture(scope="module")
def unet_pair():
    tun = _torch_unet()
    jun = _jax_unet()
    x0 = np.zeros((2, 8, 8, 8, 3), np.float32)
    init = jun.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                    jnp.zeros(2, jnp.int32),
                    jnp.zeros((2, 2, 40), jnp.float32))
    params = import_reference_unet(tun.state_dict(), **UNET_KW)
    assert tree_paths(init["params"]) == tree_paths(params)
    return tun, jun, params


def test_unet3d_forward_parity(unet_pair):
    tun, jun, params = unet_pair
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 8, 3).astype(np.float32)
    t = np.array([3, 17], np.int64)
    ctx = rng.randn(2, 2, 40).astype(np.float32)

    with torch.no_grad():
        ref = t2n(tun(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
                      timesteps=torch.from_numpy(t),
                      context=torch.from_numpy(ctx)))

    out = np.asarray(jun.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(t, jnp.int32), jnp.asarray(ctx)))
    np.testing.assert_allclose(out.transpose(0, 4, 1, 2, 3), ref,
                               rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# DDIM: one step and a short CFG chain
# ---------------------------------------------------------------------------


class _FakeDiffusion:
    """Minimal stand-in for SDFusionText2ShapeModel exposing exactly what
    DDIMSampler reads (samplers/ddim.py:15-57): schedule buffers +
    apply_model."""

    parameterization = "eps"

    def __init__(self, unet, timesteps=50):
        from model.networks.diffusion_networks.ldm_diffusion_util import \
            make_beta_schedule
        self.unet = unet
        self.num_timesteps = timesteps
        self.device = torch.device("cpu")
        betas = make_beta_schedule("linear", timesteps, 0.00085, 0.012)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas, axis=0)
        self.betas = torch.tensor(betas, dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(ac, dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(
            np.append(1.0, ac[:-1]), dtype=torch.float32)
        self.sqrt_one_minus_alphas_cumprod = torch.tensor(
            np.sqrt(1.0 - ac), dtype=torch.float32)

    def apply_model(self, x, t, c):
        return self.unet(x, timesteps=t, context=c)


def _cpu_ddim_sampler(fake):
    from model.networks.diffusion_networks.samplers.ddim import DDIMSampler

    class CPUDDIM(DDIMSampler):
        # the reference register_buffer force-moves to CUDA (ddim.py:22-26)
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.float()
            setattr(self, name, attr)

    return CPUDDIM(fake)


def test_ddim_chain_parity(unet_pair):
    tun, jun, params = unet_pair
    fake = _FakeDiffusion(tun, timesteps=50)
    sampler = _cpu_ddim_sampler(fake)
    S = 5
    sampler.make_schedule(ddim_num_steps=S, ddim_eta=0.0, verbose=False)

    rng = np.random.RandomState(5)
    x_T = rng.randn(2, 8, 8, 8, 3).astype(np.float32)
    cond = rng.randn(2, 2, 40).astype(np.float32)
    uncond = rng.randn(2, 2, 40).astype(np.float32)

    # --- torch chain (= ddim_sampling loop, ddim.py:125-179) ---
    xt = torch.from_numpy(x_T.transpose(0, 4, 1, 2, 3))
    time_range = np.flip(sampler.ddim_timesteps)
    stepwise = []
    with torch.no_grad():
        for i, step in enumerate(time_range):
            index = S - i - 1
            ts = torch.full((2,), step, dtype=torch.long)
            xt, _ = sampler.p_sample_ddim(
                xt, torch.from_numpy(cond), ts, index=index,
                unconditional_guidance_scale=3.0,
                unconditional_conditioning=torch.from_numpy(uncond))
            stepwise.append(t2n(xt))

    # --- jax chain ---
    from commonscenes_tpu.diffusion.ddim import ddim_sample
    from commonscenes_tpu.diffusion.schedule import (make_ddim_tables,
                                                     make_noise_schedule)
    sched = make_noise_schedule(timesteps=50)
    tables = make_ddim_tables(sched, S, eta=0.0)
    np.testing.assert_array_equal(tables.timesteps, sampler.ddim_timesteps)
    np.testing.assert_allclose(tables.alphas,
                               np.asarray(sampler.ddim_alphas),
                               rtol=1e-6, atol=1e-8)

    def denoise_fn(x, t, c):
        return jun.apply({"params": params}, x, t, c)

    # one step only (x_T → first update) for a tight tolerance
    t0 = jnp.full((2,), int(tables.timesteps[-1]), jnp.int32)
    x_in = jnp.concatenate([jnp.asarray(x_T)] * 2, axis=0)
    t_in = jnp.concatenate([t0, t0])
    c_in = jnp.concatenate([jnp.asarray(uncond), jnp.asarray(cond)], axis=0)
    e_both = denoise_fn(x_in, t_in, c_in)
    e_uc, e_c = jnp.split(e_both, 2, axis=0)
    e_t = e_uc + 3.0 * (e_c - e_uc)
    i = S - 1
    a_t, a_prev = float(tables.alphas[i]), float(tables.alphas_prev[i])
    sq1m = float(tables.sqrt_one_minus_alphas[i])
    pred_x0 = (jnp.asarray(x_T) - sq1m * e_t) / np.sqrt(a_t)
    x_step = np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * e_t
    np.testing.assert_allclose(
        np.asarray(x_step).transpose(0, 4, 1, 2, 3), stepwise[0],
        rtol=1e-3, atol=1e-4)

    # full 5-step chain
    x0 = ddim_sample(denoise_fn, tables, jnp.asarray(x_T), jnp.asarray(cond),
                     uncond=jnp.asarray(uncond), uc_scale=3.0)
    np.testing.assert_allclose(
        np.asarray(x0).transpose(0, 4, 1, 2, 3), stepwise[-1],
        rtol=5e-3, atol=5e-4)


def _cpu_plms_sampler(fake):
    # the reference plms.py imports from 'models.*' (plural) though the
    # package on disk is 'model' — alias it (plms.py:11)
    import sys as _sys
    if "models" not in _sys.modules:
        import model as _model_pkg
        _sys.modules["models"] = _model_pkg
    from model.networks.diffusion_networks.samplers.plms import PLMSSampler

    class CPUPLMS(PLMSSampler):
        # the reference register_buffer force-moves to CUDA (plms.py:21-25)
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.float()
            setattr(self, name, attr)

    return CPUPLMS(fake)


def test_plms_chain_parity(unet_pair):
    """plms_sample vs the reference PLMSSampler (samplers/plms.py:14-247):
    full 5-step CFG chain (RK2 warm start + 2nd/3rd/4th-order
    Adams-Bashforth) through converted weights, and the warm-start first
    step alone at a tight tolerance."""
    tun, jun, params = unet_pair
    fake = _FakeDiffusion(tun, timesteps=50)
    sampler = _cpu_plms_sampler(fake)
    S = 5
    sampler.make_schedule(ddim_num_steps=S, ddim_eta=0.0, verbose=False)

    rng = np.random.RandomState(11)
    x_T = rng.randn(2, 8, 8, 8, 3).astype(np.float32)
    cond = rng.randn(2, 2, 40).astype(np.float32)
    uncond = rng.randn(2, 2, 40).astype(np.float32)

    # --- torch chain (= plms_sampling loop, plms.py:131-178) ---
    xt = torch.from_numpy(x_T.transpose(0, 4, 1, 2, 3))
    time_range = np.flip(sampler.ddim_timesteps)
    old_eps = []
    stepwise = []
    with torch.no_grad():
        for i, step in enumerate(time_range):
            index = S - i - 1
            ts = torch.full((2,), int(step), dtype=torch.long)
            ts_next = torch.full(
                (2,), int(time_range[min(i + 1, len(time_range) - 1)]),
                dtype=torch.long)
            xt, _, e_t = sampler.p_sample_plms(
                xt, torch.from_numpy(cond), ts, index=index,
                unconditional_guidance_scale=3.0,
                unconditional_conditioning=torch.from_numpy(uncond),
                old_eps=old_eps, t_next=ts_next)
            old_eps.append(e_t)
            if len(old_eps) >= 4:
                old_eps.pop(0)
            stepwise.append(t2n(xt))

    # --- jax chain ---
    from commonscenes_tpu.diffusion.plms import plms_sample
    from commonscenes_tpu.diffusion.schedule import (make_ddim_tables,
                                                     make_noise_schedule)
    sched = make_noise_schedule(timesteps=50)
    tables = make_ddim_tables(sched, S, eta=0.0)
    np.testing.assert_array_equal(tables.timesteps, sampler.ddim_timesteps)
    np.testing.assert_allclose(tables.alphas,
                               np.asarray(sampler.ddim_alphas),
                               rtol=1e-6, atol=1e-8)

    def denoise_fn(x, t, c):
        return jun.apply({"params": params}, x, t, c)

    x0 = plms_sample(denoise_fn, tables, jnp.asarray(x_T), jnp.asarray(cond),
                     uncond=jnp.asarray(uncond), uc_scale=3.0)
    np.testing.assert_allclose(
        np.asarray(x0).transpose(0, 4, 1, 2, 3), stepwise[-1],
        rtol=5e-3, atol=5e-4)

    # --- warm start + 2nd-order AB alone at a tighter tolerance: the last
    # two grid points form a self-consistent 2-step chain whose first step
    # sees the same t_next as the full run's first step ---
    import dataclasses
    two = dataclasses.replace(
        tables,
        timesteps=tables.timesteps[-2:], alphas=tables.alphas[-2:],
        alphas_prev=tables.alphas_prev[-2:],
        sqrt_one_minus_alphas=tables.sqrt_one_minus_alphas[-2:],
        sigmas=tables.sigmas[-2:])
    x2 = plms_sample(denoise_fn, two, jnp.asarray(x_T), jnp.asarray(cond),
                     uncond=jnp.asarray(uncond), uc_scale=3.0)
    np.testing.assert_allclose(
        np.asarray(x2).transpose(0, 4, 1, 2, 3), stepwise[1],
        rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass


def test_calculate_model_losses_parity():
    from model.losses import calculate_model_losses
    from commonscenes_tpu.models.losses import layout_vae_losses

    rng = np.random.RandomState(6)
    n = 11
    pred = rng.randn(n, 6).astype(np.float32)
    target = rng.randn(n, 6).astype(np.float32)
    angles = rng.randint(0, 24, n)
    logits = rng.randn(n, 24).astype(np.float32)
    logprobs = torch.log_softmax(torch.from_numpy(logits), dim=1)
    mu = rng.randn(n, 16).astype(np.float32)
    logvar = (rng.randn(n, 16) * 0.3).astype(np.float32)

    ref_total, ref_parts = calculate_model_losses(
        None, torch.from_numpy(pred), torch.from_numpy(target), "box",
        angles=torch.from_numpy(angles), angles_pred=logprobs,
        mu=torch.from_numpy(mu), logvar=torch.from_numpy(logvar),
        KL_weight=0.1, writer=_NullWriter(), counter=0, withangles=True)

    ones = jnp.ones(n)
    total, parts = layout_vae_losses(
        jnp.asarray(pred), jnp.asarray(target),
        jnp.asarray(np.asarray(logprobs)), jnp.asarray(angles),
        jnp.asarray(mu), jnp.asarray(logvar), keep_mask=ones, enc_mask=ones,
        kl_weight=0.1)

    np.testing.assert_allclose(float(total), float(ref_total),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts["box_rec"]), ref_parts["box"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts["angle_nll"]),
                               ref_parts["angle_pred"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(0.1 * parts["kld"]),
                               ref_parts["KLD_Gauss"], rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full layout encoder/decoder through the merged-checkpoint importer
# ---------------------------------------------------------------------------

ED = 16          # embedding_dim
GH = ED * 4      # gconv hidden
ADD = 8          # tiny stand-in for the 512-dim CLIP features
NOBJ = 6
NPRED = 4
NL = 2           # gcn layers


class _TorchLayout(torch.nn.Module):
    """The layout sub-modules of Sg2ScVAEModel with the reference's exact
    attribute names and constructors (VAEGAN_V2FULL.py:69-161,
    decoder_cat=True, use_angles=True, use_E2=True) so state_dict() keys
    match the merged checkpoint layout."""

    def __init__(self):
        super().__init__()
        from model.graph import GraphTripleConvNet, make_mlp
        nn = torch.nn
        box_ed = ED * 3 // 4
        ang_ed = ED // 4
        self.obj_embeddings_ec = nn.Embedding(NOBJ + 1, ED)
        self.pred_embeddings_ec = nn.Embedding(NPRED, ED * 2)
        self.obj_embeddings_dc = nn.Embedding(NOBJ + 1, ED)
        self.pred_embeddings_dc = nn.Embedding(NPRED, ED * 2)
        self.pred_embeddings_man_dc = nn.Embedding(NPRED, ED * 3)
        self.d3_embeddings = nn.Linear(6, box_ed)
        self.angle_embeddings = nn.Embedding(24, ang_ed)
        self.mean_var = make_mlp([ED * 2 + ADD, GH, ED * 2], batch_norm="batch")
        self.mean = make_mlp([ED * 2, box_ed], batch_norm="batch", norelu=True)
        self.var = make_mlp([ED * 2, box_ed], batch_norm="batch", norelu=True)
        self.angle_mean_var = make_mlp([ED * 2 + ADD, GH, ED * 2],
                                       batch_norm="batch")
        self.angle_mean = make_mlp([ED * 2, ang_ed], batch_norm="batch",
                                   norelu=True)
        self.angle_var = make_mlp([ED * 2, ang_ed], batch_norm="batch",
                                  norelu=True)
        gk = dict(hidden_dim=GH, pooling="avg", num_layers=NL,
                  mlp_normalization="batch", residual=False)
        self.gconv_net_ec_box = GraphTripleConvNet(
            input_dim_obj=ED * 2 + ADD, input_dim_pred=ED * 2 + ADD, **gk)
        self.gconv_net_dc = GraphTripleConvNet(
            input_dim_obj=ED * 2 + ADD, input_dim_pred=ED * 2 + ADD, **gk)
        self.gconv_net_manipulation = GraphTripleConvNet(
            input_dim_obj=ED * 3 + ADD, input_dim_pred=ED * 3 + ADD,
            output_dim=ED, **gk)
        self.gconv_net_ec_rel = GraphTripleConvNet(
            input_dim_obj=ED * 2 + ADD, input_dim_pred=ED * 2 + ADD, **gk)
        self.d3_net = make_mlp([ED * 2 + ADD, GH, 6], batch_norm="batch",
                               norelu=True)
        self.angle_net = make_mlp([ED * 2 + ADD, GH, 24], batch_norm="batch",
                                  norelu=True)
        self.rel_mlp = make_mlp([ED * 2 + ADD, 24, 40], batch_norm="batch",
                                norelu=True)


def _jax_layout():
    from commonscenes_tpu.core.config import LayoutConfig
    from commonscenes_tpu.models.layout_vae import LayoutVAE
    cfg = LayoutConfig(embedding_dim=ED, gconv_num_layers=NL,
                       gconv_pooling="avg", mlp_normalization="batch",
                       residual=False, decoder_cat=True, use_angles=True,
                       use_clip=True, clip_dim=ADD, use_e2=True,
                       rel_hidden_crossattn=24, rel_out_crossattn=40)
    return LayoutVAE(cfg, num_obj_classes=NOBJ, num_pred_classes=NPRED,
                     build_rel_encoder=True)


def _scene_view(rng, n, t):
    """One unpadded scene as a B=1 SceneView."""
    from commonscenes_tpu.core.graph import SceneView
    objs = rng.randint(0, NOBJ, n).astype(np.int32)
    triples = np.stack([rng.randint(0, n, t),
                        rng.randint(0, NPRED, t),
                        rng.randint(0, n, t)], axis=1).astype(np.int32)
    boxes = rng.randn(n, 6).astype(np.float32)
    angles = rng.randint(0, 24, n).astype(np.int32)
    text = rng.randn(n, ADD).astype(np.float32)
    rel = rng.randn(t, ADD).astype(np.float32)
    view = SceneView(
        objs=jnp.asarray(objs[None]),
        objs_grained=jnp.asarray(objs[None]),
        obj_mask=jnp.ones((1, n)),
        triples=jnp.asarray(triples[None]),
        triple_mask=jnp.ones((1, t)),
        boxes=jnp.asarray(boxes[None]),
        angles=jnp.asarray(angles[None]),
        text_feats=jnp.asarray(text[None]),
        rel_feats=jnp.asarray(rel[None]),
    )
    return view, objs, triples, boxes, angles, text, rel


def _torch_encoder(tl, objs, triples, boxes, angles, text, rel):
    """The reference encoder() forward (VAEGAN_V2FULL.py:185-218) on the
    _TorchLayout modules."""
    o = torch.from_numpy(objs).long()
    tr = torch.from_numpy(triples).long()
    s, p, ob = tr.chunk(3, dim=1)
    edges = torch.stack([s.squeeze(1), ob.squeeze(1)], dim=1)
    obj_vecs = tl.obj_embeddings_ec(o)
    pred_vecs = tl.pred_embeddings_ec(p.squeeze(1))
    d3 = tl.d3_embeddings(torch.from_numpy(boxes))
    obj_vecs = torch.cat([torch.from_numpy(text), obj_vecs], dim=1)
    pred_vecs = torch.cat([torch.from_numpy(rel), pred_vecs], dim=1)
    ang = tl.angle_embeddings(torch.from_numpy(angles).long())
    obj_vecs = torch.cat([obj_vecs, d3, ang], dim=1)
    obj_vecs, pred_vecs = tl.gconv_net_ec_box(obj_vecs, pred_vecs, edges)
    h = tl.mean_var(obj_vecs)
    mu = tl.mean(h)
    logvar = tl.var(h)
    ha = tl.angle_mean_var(obj_vecs)
    mu = torch.cat([mu, tl.angle_mean(ha)], dim=1)
    logvar = torch.cat([logvar, tl.angle_var(ha)], dim=1)
    return mu, logvar


def _torch_decoder(tl, z, objs, triples, text, rel):
    """The reference decoder() forward (VAEGAN_V2FULL.py:264-289,
    decoder_cat=True) on the _TorchLayout modules."""
    o = torch.from_numpy(objs).long()
    tr = torch.from_numpy(triples).long()
    s, p, ob = tr.chunk(3, dim=1)
    edges = torch.stack([s.squeeze(1), ob.squeeze(1)], dim=1)
    obj_vecs = tl.obj_embeddings_dc(o)
    pred_vecs = tl.pred_embeddings_dc(p.squeeze(1))
    obj_vecs = torch.cat([torch.from_numpy(text), obj_vecs], dim=1)
    pred_vecs = torch.cat([torch.from_numpy(rel), pred_vecs], dim=1)
    obj_vecs = torch.cat([obj_vecs, torch.from_numpy(z)], dim=1)
    obj_vecs, _ = tl.gconv_net_dc(obj_vecs, pred_vecs, edges)
    d3 = tl.d3_net(obj_vecs)
    angles = torch.log_softmax(tl.angle_net(obj_vecs), dim=1)
    return d3, angles


@pytest.fixture(scope="module")
def layout_pair():
    torch.manual_seed(7)
    tl = _TorchLayout()
    # non-trivial BN stats
    tl.train()
    with torch.no_grad():
        rng = np.random.RandomState(8)
        for _ in range(2):
            _torch_encoder(tl, *(_make_raw(rng)))
    tl.eval()

    merged = {k: v for k, v in tl.state_dict().items()}
    merged["vqvae"] = _torch_vqvae().state_dict()
    merged["df"] = _torch_unet().state_dict()
    merged["opt"] = {}
    merged["epoch"] = 3
    merged["counter"] = 1234

    jl = _jax_layout()
    jvq = _jax_vqvae()
    x0 = np.zeros((1, 16, 16, 16, 1), np.float32)
    vq_init = jvq.init(jax.random.PRNGKey(0), jnp.asarray(x0))

    out = import_reference_v2full_checkpoint(
        merged, layout_params=None, vqvae_params=vq_init["params"],
        unet_kwargs=UNET_KW, num_gcn_layers=NL, pooling="avg",
        residual=False, use_angles=True, use_e2=True)
    assert out["epoch"] == 3 and out["counter"] == 1234
    assert out["vqvae"] is not None and out["df"] is not None
    return tl, jl, out


def _make_raw(rng, n=7, t=10):
    objs = rng.randint(0, NOBJ, n)
    triples = np.stack([rng.randint(0, n, t), rng.randint(0, NPRED, t),
                        rng.randint(0, n, t)], axis=1)
    boxes = rng.randn(n, 6).astype(np.float32)
    angles = rng.randint(0, 24, n)
    text = rng.randn(n, ADD).astype(np.float32)
    rel = rng.randn(t, ADD).astype(np.float32)
    return objs, triples, boxes, angles, text, rel


def test_v2full_layout_encoder_decoder_parity(layout_pair):
    tl, jl, imported = layout_pair
    params, stats = imported["layout"]

    rng = np.random.RandomState(9)
    view, objs, triples, boxes, angles, text, rel = _scene_view(rng, 7, 10)

    # structure check vs a fresh init
    init = jl.init(jax.random.PRNGKey(0), view, view,
                   jnp.zeros((1, 7)), jnp.zeros((1, 7)),
                   jax.random.PRNGKey(1))
    assert tree_paths(init["params"]) == tree_paths(params)

    variables = {"params": params, "batch_stats": stats}
    with torch.no_grad():
        ref_mu, ref_logvar = _torch_encoder(tl, objs, triples, boxes, angles,
                                            text, rel)
    mu, logvar = jl.apply(variables, view, train=False, method=jl.encode)
    np.testing.assert_allclose(np.asarray(mu), t2n(ref_mu),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar), t2n(ref_logvar),
                               rtol=RTOL, atol=ATOL)

    z = rng.randn(7, ED).astype(np.float32)
    with torch.no_grad():
        ref_d3, ref_ang = _torch_decoder(tl, z, objs, triples, text, rel)
    d3, ang = jl.apply(variables, jnp.asarray(z), view, train=False,
                       method=jl.decode)
    np.testing.assert_allclose(np.asarray(d3), t2n(ref_d3),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ang), t2n(ref_ang),
                               rtol=RTOL, atol=ATOL)


def test_masked_bn_running_stats_match_torch_update():
    """The running-VAR update must store torch's UNBIASED estimate
    (BatchNorm1d semantics), for full and masked batches."""
    from commonscenes_tpu.nn.mlp import MaskedBatchNorm

    x = np.random.RandomState(2).randn(9, 6).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(6, momentum=0.1).train()
    tbn(torch.from_numpy(x))

    m = MaskedBatchNorm(momentum=0.9)   # ours: ra = mom*ra + (1-mom)*new
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    _, ups = m.apply(variables, jnp.asarray(x), train=True,
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ups["batch_stats"]["var"]),
                               t2n(tbn.running_var), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ups["batch_stats"]["mean"]),
                               t2n(tbn.running_mean), rtol=1e-5)

    # masked batch == torch on just the valid rows
    n_valid = 5
    tbn2 = torch.nn.BatchNorm1d(6, momentum=0.1).train()
    tbn2(torch.from_numpy(x[:n_valid]))
    mask = jnp.asarray((np.arange(9) < n_valid).astype(np.float32))
    _, ups2 = m.apply(variables, jnp.asarray(x), mask=mask, train=True,
                      mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ups2["batch_stats"]["var"]),
                               t2n(tbn2.running_var), rtol=1e-5)
