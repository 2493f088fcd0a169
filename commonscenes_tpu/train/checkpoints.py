"""Checkpoint save/load with the reference's logical layout + torch interop.

Capability parity with the reference's merged checkpoint
(model/VAEGAN_V2FULL.state_dict:687-699 — one file holding the layout VAE
weights plus 'vqvae', 'df', 'opt', 'epoch', 'counter' sub-trees) and
VAE.load_networks (model/VAE.py:102-158) which restores each module and
re-seats the LR schedule at ``counter``.

TPU-native: orbax PyTree checkpoints with the same logical sub-trees, plus
a torch→JAX state-dict converter so reference .pth weights (e.g. the
pretrained vqvae_threedfront_best.pth) can be imported for parity testing —
handling the NCDHW→NDHWC conv kernel transpose and Linear transpose.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def fetch_tree_chunked(tree, chunk_bytes: Optional[int] = None,
                       log_label: str = "", force: bool = False) -> Any:
    """Sequentially fetch a device pytree to host numpy, slicing any leaf
    larger than ``chunk_bytes`` into flat ``lax.dynamic_slice`` pieces.

    Exists for the tunneled-TPU transport: the v2_full train state is
    5.35 GB, and letting orbax gather it directly wedges the relay — two
    independent runs froze at bytes_received≈5,349,939,825 with the
    socket permanently silent (measured round 5; tools/probe_tunnel.py).
    The same transport moves 6+ GB without issue as sequential ≤64 MB
    fetches (~10 MB/s), while a single 97.5 MB array fetch degrades to
    ~0.3 MB/s. So: one leaf at a time, big leaves in flat chunks, nothing
    concurrent. On the CPU backend this is skipped entirely (tests,
    virtual-mesh dryruns): plain ``np.asarray`` per leaf.
    """
    import jax.numpy as jnp
    from jax import lax

    if chunk_bytes is None:
        chunk_bytes = int(float(os.environ.get(
            "COMMONSCENES_FETCH_CHUNK_MB", "64")) * 1e6)

    cpu = jax.default_backend() == "cpu" and not force
    done_mb = [0.0]

    def fetch(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        nbytes = int(np.prod(leaf.shape or (1,))) * \
            np.dtype(leaf.dtype).itemsize
        if cpu or nbytes <= chunk_bytes or not isinstance(leaf, jax.Array):
            out = np.asarray(leaf)
        else:
            flat = jnp.ravel(leaf)
            n = flat.shape[0]
            per = max(1, int(chunk_bytes // np.dtype(leaf.dtype).itemsize))
            pieces = []
            i = 0
            while i < n:
                m = min(per, n - i)
                # static slice size per (dtype, m): at most two programs
                # per distinct leaf geometry (full chunk + tail)
                piece = lax.dynamic_slice(flat, (i,), (m,))
                pieces.append(np.asarray(piece))
                i += m
            out = np.concatenate(pieces).reshape(leaf.shape)
        done_mb[0] += out.nbytes / 1e6
        if log_label and out.nbytes > chunk_bytes / 2:
            print(f"[ckpt-fetch {log_label}] {done_mb[0]:9.1f} MB done",
                  flush=True)
        return out

    return jax.tree.map(fetch, tree)


def save_checkpoint(path: str, state, epoch: int = 0) -> None:
    """Write the TrainState with reference-like sub-trees via orbax.

    The device→host gather happens HERE, sequentially and chunked
    (``fetch_tree_chunked``) — orbax only ever sees host numpy, so its
    concurrent array gathers never touch the tunnel transport."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    tree = {
        "layout": state.gen_params["layout"],
        "df": state.gen_params.get("df") or {},
        "vqvae": state.vqvae_params or {},
        "disc": state.disc_params or {},
        "batch_stats": {"layout": state.gen_stats["layout"],
                        "disc": state.disc_stats or {}},
        "opt": {"gen": state.gen_opt, "disc": state.disc_opt},
        "meta": {"epoch": np.asarray(epoch),
                 "counter": np.asarray(state.step)},
    }
    tree = fetch_tree_chunked(tree, log_label=f"epoch{epoch}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def _counter_template(step):
    """Meta-counter template leaf that also accepts abstract states.

    Eval builds its restore template with jax.eval_shape (skipping the
    on-device random-init compile entirely); a ShapeDtypeStruct step
    can't go through np.asarray, but a zero of the same shape/dtype is
    an equally good orbax template."""
    if isinstance(step, jax.ShapeDtypeStruct):
        return np.zeros(step.shape, step.dtype)
    return np.asarray(step)


def restore_checkpoint(path: str, state):
    """Restore into a TrainState template (shapes must match; the
    template may be abstract — from jax.eval_shape — since every leaf
    is overwritten by the restore)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    template = {
        "layout": state.gen_params["layout"],
        "df": state.gen_params.get("df") or {},
        "vqvae": state.vqvae_params or {},
        "disc": state.disc_params or {},
        "batch_stats": {"layout": state.gen_stats["layout"],
                        "disc": state.disc_stats or {}},
        "opt": {"gen": state.gen_opt, "disc": state.disc_opt},
        "meta": {"epoch": np.asarray(0),
                 "counter": _counter_template(state.step)},
    }
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path, target=template)
    new_state = state.replace(
        step=jax.numpy.asarray(tree["meta"]["counter"]),
        gen_params={"layout": tree["layout"], "df": tree["df"]},
        gen_stats={"layout": tree["batch_stats"]["layout"]},
        vqvae_params=tree["vqvae"],
        disc_params=tree["disc"],
        disc_stats=tree["batch_stats"]["disc"],
        gen_opt=tree["opt"]["gen"],
        disc_opt=tree["opt"]["disc"],
    )
    return new_state, int(tree["meta"]["epoch"])


# ---------------------------------------------------------------------------
# torch → JAX weight conversion (for reference-checkpoint parity tests)
# ---------------------------------------------------------------------------


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_torch_conv3d(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch Conv3d [out, in, kD, kH, kW] → flax [kD, kH, kW, in, out]."""
    w = _t2n(weight).transpose(2, 3, 4, 1, 0)
    out = {"kernel": w}
    if bias is not None:
        out["bias"] = _t2n(bias)
    return out


def convert_torch_linear(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch Linear [out, in] → flax Dense [in, out]."""
    out = {"kernel": _t2n(weight).T}
    if bias is not None:
        out["bias"] = _t2n(bias)
    return out


def convert_torch_groupnorm(weight, bias) -> Dict[str, np.ndarray]:
    return {"scale": _t2n(weight), "bias": _t2n(bias)}


def import_torch_mlp(sd: Dict[str, np.ndarray], prefix: str):
    """torch ``build_mlp`` Sequential (model/layers.py:21-38: Linear /
    [BatchNorm1d] / ReLU stacks) → our ``MLP`` tree.

    Returns (params {dense_i, bn_i}, batch_stats {bn_i}) — batch_stats is
    empty when the stack has no BatchNorm.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    pre = f"{prefix}." if prefix else ""
    li = bi = 0
    for j in range(64):
        w = sd.get(f"{pre}{j}.weight")
        if w is None:
            continue
        if w.ndim == 2:  # Linear
            params[f"dense_{li}"] = convert_torch_linear(
                w, sd.get(f"{pre}{j}.bias"))
            li += 1
        elif w.ndim == 1:  # BatchNorm1d
            params[f"bn_{bi}"] = {"scale": _t2n(w),
                                  "bias": _t2n(sd[f"{pre}{j}.bias"])}
            stats[f"bn_{bi}"] = {
                "mean": _t2n(sd[f"{pre}{j}.running_mean"]),
                "var": _t2n(sd[f"{pre}{j}.running_var"])}
            bi += 1
    return params, stats


def import_reference_gcn(sd: Dict[str, Any], prefix: str, num_layers: int,
                         pooling: str = "avg", residual: bool = False):
    """Reference ``GraphTripleConvNet`` state dict (model/graph.py:214-250,
    sub-modules ``gconvs.{i}.{net1,net2,linear_projection[,_pred],
    weightNet}``) → our ``GraphTripleConvNet`` tree {gconv_i: ...}.

    Returns (params, batch_stats); batch_stats empty without BN.
    """
    sd = {k: _t2n(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_layers):
        lp = f"{prefix}gconvs.{i}" if prefix == "" or prefix.endswith(".") \
            else f"{prefix}.gconvs.{i}"
        layer: Dict[str, Any] = {}
        lstats: Dict[str, Any] = {}
        for net in ("net1", "net2"):
            p, s = import_torch_mlp(sd, f"{lp}.{net}")
            layer[net] = p
            if s:
                lstats[net] = s
        if residual:
            layer["proj_obj"] = convert_torch_linear(
                sd[f"{lp}.linear_projection.weight"],
                sd.get(f"{lp}.linear_projection.bias"))
            layer["proj_pred"] = convert_torch_linear(
                sd[f"{lp}.linear_projection_pred.weight"],
                sd.get(f"{lp}.linear_projection_pred.bias"))
        if pooling == "wAvg":
            wn = f"{lp}.weightNet"
            layer["weight_net"] = {
                "down_obj": convert_torch_linear(
                    sd[f"{wn}.down_sample_obj.weight"],
                    sd.get(f"{wn}.down_sample_obj.bias")),
                "down_pred": convert_torch_linear(
                    sd[f"{wn}.down_sample_pred.weight"],
                    sd.get(f"{wn}.down_sample_pred.bias")),
                "net_s_0": convert_torch_linear(
                    sd[f"{wn}.Net_s.0.weight"], sd.get(f"{wn}.Net_s.0.bias")),
                "net_s_1": convert_torch_linear(
                    sd[f"{wn}.Net_s.2.weight"], sd.get(f"{wn}.Net_s.2.bias")),
                "net_o_0": convert_torch_linear(
                    sd[f"{wn}.Net_o.0.weight"], sd.get(f"{wn}.Net_o.0.bias")),
                "net_o_1": convert_torch_linear(
                    sd[f"{wn}.Net_o.2.weight"], sd.get(f"{wn}.Net_o.2.bias")),
            }
        params[f"gconv_{i}"] = layer
        if lstats:
            stats[f"gconv_{i}"] = lstats
    return params, stats


def import_reference_unet(torch_state_dict: Dict[str, Any],
                          model_channels: int,
                          channel_mult,
                          num_res_blocks: int,
                          attention_resolutions,
                          transformer_depth: int = 1) -> Dict[str, Any]:
    """Reference ``UNet3DModel`` state dict (openai_model_3d.py:452-789,
    torch module names ``time_embed`` / ``input_blocks.{i}`` /
    ``middle_block`` / ``output_blocks.{i}`` / ``out``) → our ``UNet3D``
    parameter tree, handling NCDHW→NDHWC conv transposes, Linear transposes
    and the Conv3d-1×1 → Dense projections of the spatial transformers.
    """
    sd = {k: _t2n(v) for k, v in torch_state_dict.items()}
    params: Dict[str, Any] = {}

    def lin(src):
        return convert_torch_linear(sd[src + ".weight"], sd.get(src + ".bias"))

    def conv(src):
        return convert_torch_conv3d(sd[src + ".weight"], sd.get(src + ".bias"))

    def conv1x1_dense(src):
        w = sd[src + ".weight"]  # [O, I, 1, 1, 1]
        out = {"kernel": w[:, :, 0, 0, 0].T}
        if src + ".bias" in sd:
            out["bias"] = sd[src + ".bias"]
        return out

    def gnorm(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    def resblock(src):
        p = {
            "norm1": gnorm(src + ".in_layers.0"),
            "conv1": conv(src + ".in_layers.2"),
            "emb_proj": lin(src + ".emb_layers.1"),
            "norm2": gnorm(src + ".out_layers.0"),
            "conv2": conv(src + ".out_layers.3"),
        }
        if src + ".skip_connection.weight" in sd:
            p["skip"] = conv(src + ".skip_connection")
        return p

    def attention_block(src):
        # CrossAttention (attention.py:154-219): to_q/k/v no-bias Linears,
        # to_out.0 Linear
        return {
            "to_q": lin(src + ".to_q"),
            "to_k": lin(src + ".to_k"),
            "to_v": lin(src + ".to_v"),
            "to_out": lin(src + ".to_out.0"),
        }

    def lnorm(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    def transformer(src):
        p = {
            "norm": gnorm(src + ".norm"),
            "proj_in": conv1x1_dense(src + ".proj_in"),
            "proj_out": conv1x1_dense(src + ".proj_out"),
        }
        for d in range(transformer_depth):
            b = f"{src}.transformer_blocks.{d}"
            p[f"block_{d}"] = {
                "attn1": attention_block(b + ".attn1"),
                "attn2": attention_block(b + ".attn2"),
                "norm1": lnorm(b + ".norm1"),
                "norm2": lnorm(b + ".norm2"),
                "norm3": lnorm(b + ".norm3"),
                "ff": {"geglu": {"proj": lin(b + ".ff.net.0.proj")},
                       "out": lin(b + ".ff.net.2")},
            }
        return p

    params["time_0"] = lin("time_embed.0")
    params["time_1"] = lin("time_embed.2")
    params["conv_in"] = conv("input_blocks.0.0")

    ib = 1
    block = 0
    ds = 1
    for level, _mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            params[f"down_res_{block}"] = resblock(f"input_blocks.{ib}.0")
            if ds in attention_resolutions:
                params[f"down_attn_{block}"] = transformer(
                    f"input_blocks.{ib}.1")
            ib += 1
            block += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}"] = {"op": conv(f"input_blocks.{ib}.0.op")}
            ib += 1
            ds *= 2

    params["mid_res_0"] = resblock("middle_block.0")
    params["mid_attn"] = transformer("middle_block.1")
    params["mid_res_1"] = resblock("middle_block.2")

    ob = 0
    block = 0
    for level, _mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"up_res_{block}"] = resblock(f"output_blocks.{ob}.0")
            nxt = 1
            if ds in attention_resolutions:
                params[f"up_attn_{block}"] = transformer(
                    f"output_blocks.{ob}.{nxt}")
                nxt += 1
            if level and i == num_res_blocks:
                params[f"up_{level}"] = {
                    "conv": conv(f"output_blocks.{ob}.{nxt}.conv")}
                ds //= 2
            ob += 1
            block += 1

    params["norm_out"] = gnorm("out.0")
    params["conv_out"] = conv("out.2")
    return params


def import_reference_layout(torch_state_dict: Dict[str, Any],
                            num_gcn_layers: int = 5,
                            pooling: str = "avg",
                            residual: bool = False,
                            use_angles: bool = True,
                            use_e2: bool = True):
    """Reference ``Sg2ScVAEModel`` layout weights (the top-level keys of the
    merged v2_full .pth, VAEGAN_V2FULL.py:687-699) → our ``LayoutVAE``
    parameter tree. ``Diff.*`` keys are ignored (they duplicate the 'vqvae'
    and 'df' sub-dicts).

    Returns (params, batch_stats).
    """
    sd = {k: _t2n(v) for k, v in torch_state_dict.items()
          if not k.startswith("Diff.")}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def embed(dst, src):
        params[dst] = {"embedding": sd[src + ".weight"]}

    embed("obj_embed_ec", "obj_embeddings_ec")
    embed("pred_embed_ec", "pred_embeddings_ec")
    embed("obj_embed_dc", "obj_embeddings_dc")
    embed("pred_embed_dc", "pred_embeddings_dc")
    if "pred_embeddings_man_dc.weight" in sd:
        embed("pred_embed_man_dc", "pred_embeddings_man_dc")
    params["box_embed"] = convert_torch_linear(
        sd["d3_embeddings.weight"], sd.get("d3_embeddings.bias"))
    if use_angles and "angle_embeddings.weight" in sd:
        embed("angle_embed", "angle_embeddings")

    mlp_map = {"mean_var": "mean_var", "mean": "mean_head", "var": "var_head",
               "d3_net": "d3_net", "rel_mlp": "rel_mlp"}
    if use_angles:
        mlp_map.update({"angle_mean_var": "angle_mean_var",
                        "angle_mean": "angle_mean_head",
                        "angle_var": "angle_var_head",
                        "angle_net": "angle_net"})
    for src, dst in mlp_map.items():
        if any(k.startswith(src + ".") for k in sd):
            p, s = import_torch_mlp(sd, src)
            params[dst] = p
            if s:
                stats[dst] = s

    gcn_map = {"gconv_net_ec_box": "gconv_ec_box",
               "gconv_net_dc": "gconv_dc",
               "gconv_net_manipulation": "gconv_manipulation"}
    if use_e2:
        gcn_map["gconv_net_ec_rel"] = "gconv_ec_rel"
    for src, dst in gcn_map.items():
        if not any(k.startswith(src + ".") for k in sd):
            continue
        n_layers = num_gcn_layers
        if src == "gconv_net_manipulation":
            n_layers = min(num_gcn_layers, 5)
        sub = {k[len(src) + 1:]: v for k, v in sd.items()
               if k.startswith(src + ".")}
        p, s = import_reference_gcn(sub, "", n_layers, pooling, residual)
        params[dst] = p
        if s:
            stats[dst] = s
    return params, stats


def infer_reference_layout_hparams(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Recover the Sg2ScVAEModel hyperparameters from a merged reference
    state dict (VAEGAN_V2FULL.py:22-174 construction rules), so a .pth can
    be imported without knowing the original CLI flags.

    Pooling 'sum' vs 'avg' is not recoverable from weights (same params) —
    returned as 'avg' (the reference default); 'wAvg' is detected via
    weightNet keys.
    """
    keys = set(sd.keys())
    ed = sd["obj_embeddings_ec.weight"].shape[1]
    num_obj = sd["obj_embeddings_ec.weight"].shape[0] - 1
    num_pred = sd["pred_embeddings_ec.weight"].shape[0]
    add = sd["mean_var.0.weight"].shape[1] - 2 * ed
    gcn_layers = 1 + max(
        (int(k.split(".")[2]) for k in keys
         if k.startswith("gconv_net_ec_box.gconvs.")), default=0)
    residual = any(".linear_projection." in k
                   for k in keys if k.startswith("gconv_net_ec_box."))
    pooling = "wAvg" if any(".weightNet." in k for k in keys) else "avg"
    mlp_norm = "batch" if "mean_var.1.running_mean" in sd else "none"
    use_angles = any(k.startswith("angle_net.") for k in keys)
    decoder_cat = (sd["pred_embeddings_dc.weight"].shape[1] == 2 * ed)
    use_e2 = any(k.startswith("gconv_net_ec_rel.") for k in keys)
    rel_hidden, rel_out = 960, 1280
    rel_linears = sorted((k for k in keys if k.startswith("rel_mlp.")
                          and k.endswith(".weight")
                          and sd[k].ndim == 2),
                         key=lambda k: int(k.split(".")[1]))
    if rel_linears:
        rel_hidden = int(sd[rel_linears[0]].shape[0])
        rel_out = int(sd[rel_linears[-1]].shape[0])
    return {
        "rel_hidden": rel_hidden, "rel_out": rel_out,
        "embedding_dim": int(ed), "num_obj_classes": int(num_obj),
        "num_pred_classes": int(num_pred), "clip_dim": int(add),
        "use_clip": add > 0, "gconv_num_layers": int(gcn_layers),
        "residual": bool(residual), "gconv_pooling": pooling,
        "mlp_normalization": mlp_norm, "use_angles": bool(use_angles),
        "decoder_cat": bool(decoder_cat), "use_e2": bool(use_e2),
        "conditioning_key": "concat" if rel_out >= 4096 else "crossattn",
    }


def import_reference_v2full_checkpoint(merged_sd: Dict[str, Any],
                                       layout_params: Dict[str, Any],
                                       vqvae_params: Optional[Dict[str, Any]] = None,
                                       unet_kwargs: Optional[Dict[str, Any]] = None,
                                       **layout_kwargs):
    """Split + convert the reference's merged v2_full checkpoint
    (one .pth holding the Sg2ScVAEModel weights plus 'vqvae'/'df'/'opt'/
    'epoch'/'counter' sub-trees, model/VAE.py:102-158) into our logical
    sub-trees.

    ``layout_params`` is our initialized LayoutVAE params (structure/shape
    template); ``vqvae_params`` likewise for the VQ-VAE (optional);
    ``unet_kwargs`` are the UNet geometry args for ``import_reference_unet``.

    Returns dict(layout=(params, stats), vqvae=params|None, df=params|None,
    epoch=int, counter=int). The torch AdamW 'opt' state is mapped
    separately by ``import_reference_adam_moments`` (the algebras align
    exactly — see its docstring); this function only splits the weights.
    """
    sd = dict(merged_sd)
    vq_sd = sd.pop("vqvae", None)
    df_sd = sd.pop("df", None)
    sd.pop("opt", None)
    epoch = int(sd.pop("epoch", 0))
    counter = int(sd.pop("counter", 0))

    out: Dict[str, Any] = {"epoch": epoch, "counter": counter}
    out["layout"] = import_reference_layout(sd, **layout_kwargs)
    out["vqvae"] = (import_reference_vqvae(vq_sd, vqvae_params)
                    if vq_sd is not None and vqvae_params is not None else None)
    out["df"] = (import_reference_unet(df_sd, **unet_kwargs)
                 if df_sd is not None and unet_kwargs is not None else None)
    return out


def import_reference_vqvae(torch_state_dict: Dict[str, Any],
                           jax_params: Dict[str, Any]) -> Dict[str, Any]:
    """Map the reference's VQVAE .pth state dict
    (model/networks/vqvae_networks/network.py module names) onto our
    VQVAE3D parameter tree. Returns a new params tree.

    Name mapping: encoder.down.{l}.block.{b} → encoder/down_{l}_block_{b},
    mid.{block_1,attn_1,block_2} → mid_{block,attn}_..., quantize.embedding
    → quantize/embedding (+1/n shift handled at apply time), quant convs 1:1.
    """
    import copy
    params = copy.deepcopy(jax.tree.map(np.asarray, jax_params))
    sd = {k: _t2n(v) for k, v in torch_state_dict.items()}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, \
            f"{path}: {node[path[-1]].shape} vs {val.shape}"
        node[path[-1]] = val

    def conv(dst, src):
        put(dst + ["kernel"], sd[src + ".weight"].transpose(2, 3, 4, 1, 0))
        if src + ".bias" in sd:
            put(dst + ["bias"], sd[src + ".bias"])

    def norm(dst, src):
        put(dst + ["scale"], sd[src + ".weight"])
        put(dst + ["bias"], sd[src + ".bias"])

    def resblock(dst, src):
        norm(dst + ["norm1"], src + ".norm1")
        conv(dst + ["conv1"], src + ".conv1")
        norm(dst + ["norm2"], src + ".norm2")
        conv(dst + ["conv2"], src + ".conv2")
        if src + ".nin_shortcut.weight" in sd:
            conv(dst + ["nin_shortcut"], src + ".nin_shortcut")

    def attn(dst, src):
        norm(dst + ["norm"], src + ".norm")
        for nm in ("q", "k", "v", "proj_out"):
            conv(dst + [nm], f"{src}.{nm}")

    for tower in ("encoder", "decoder"):
        conv([tower, "conv_in"], f"{tower}.conv_in")
        conv([tower, "conv_out"], f"{tower}.conv_out")
        norm([tower, "norm_out"], f"{tower}.norm_out")
        resblock([tower, "mid_block_1"], f"{tower}.mid.block_1")
        resblock([tower, "mid_block_2"], f"{tower}.mid.block_2")
        attn([tower, "mid_attn"], f"{tower}.mid.attn_1")

    lvl = 0
    while f"encoder.down.{lvl}.block.0.norm1.weight" in sd:
        b = 0
        while f"encoder.down.{lvl}.block.{b}.norm1.weight" in sd:
            resblock(["encoder", f"down_{lvl}_block_{b}"],
                     f"encoder.down.{lvl}.block.{b}")
            # per-level attention, present when attn_resolutions hits this
            # level (vqvae_modules.py:225-227)
            if f"encoder.down.{lvl}.attn.{b}.norm.weight" in sd:
                attn(["encoder", f"down_{lvl}_attn_{b}"],
                     f"encoder.down.{lvl}.attn.{b}")
            b += 1
        if f"encoder.down.{lvl}.downsample.conv.weight" in sd:
            conv(["encoder", f"down_{lvl}_ds", "conv"],
                 f"encoder.down.{lvl}.downsample.conv")
        lvl += 1

    lvl = 0
    while f"decoder.up.{lvl}.block.0.norm1.weight" in sd:
        b = 0
        while f"decoder.up.{lvl}.block.{b}.norm1.weight" in sd:
            resblock(["decoder", f"up_{lvl}_block_{b}"],
                     f"decoder.up.{lvl}.block.{b}")
            if f"decoder.up.{lvl}.attn.{b}.norm.weight" in sd:
                attn(["decoder", f"up_{lvl}_attn_{b}"],
                     f"decoder.up.{lvl}.attn.{b}")
            b += 1
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            conv(["decoder", f"up_{lvl}_us", "conv"],
                 f"decoder.up.{lvl}.upsample.conv")
        lvl += 1

    conv(["quant_conv"], "quant_conv")
    conv(["post_quant_conv"], "post_quant_conv")
    # our quantizer subtracts 1/n_embed at apply time (uniform-init shift),
    # so store weight + 1/n
    emb = sd["quantize.embedding.weight"]
    put(["quantize", "embedding"], emb + 1.0 / emb.shape[0])
    return params


# ---------------------------------------------------------------------------
# optimizer-moment migration
# ---------------------------------------------------------------------------

_TORCH_BUFFER_SUFFIXES = ("running_mean", "running_var",
                          "num_batches_tracked")


def _torch_param_names(sd: Dict[str, Any]):
    """Parameter names of a torch state dict in module order = the order of
    ``module.parameters()``: state_dict preserves registration order and the
    only buffers in this model family are the BatchNorm running stats."""
    return [k for k in sd
            if not k.endswith(_TORCH_BUFFER_SUFFIXES)
            and not k.startswith("Diff.")]


def import_reference_adam_moments(layout_sd: Dict[str, Any],
                                  df_sd: Dict[str, Any],
                                  opt_sd: Dict[str, Any],
                                  layout_kwargs: Dict[str, Any],
                                  unet_kwargs: Dict[str, Any]):
    """Map the reference AdamW state (``opt`` sub-dict of the merged .pth,
    model/VAE.py:120-148 ``load_networks``) onto our optax trees.

    The reference optimizer is ``AdamW(vae_v2.parameters() +
    Diff.trainable_params)`` (VAEGAN_V2FULL.py:635-650,
    sdfusion_txt2shape_model.py:96-101 — the df only; the vqvae is frozen),
    so state index i maps to the i-th parameter of the layout module
    followed by the UNet. Adam moments are elementwise and shaped exactly
    like their parameters, so each ``exp_avg``/``exp_avg_sq`` tensor is
    converted through the SAME reshape/transpose converters as the weight
    it tracks (all converters are permutations — moment-safe). The optimizer
    algebras align exactly: torch AdamW's decoupled decay
    ``p -= lr*(m_hat/(sqrt(v_hat)+eps) + wd*p)`` is optax.adamw's update
    rule, and both bias-correct from an integer step count.

    Returns (mu_tree, nu_tree, count) where the trees have the
    ``{"layout": ..., "df": {"unet": ...}}`` structure of gen_params.
    Raises ValueError when the state cannot be aligned (e.g. a parameter
    count mismatch from a frozen subset we cannot see).
    """
    names_layout = _torch_param_names(layout_sd)
    names_df = _torch_param_names(df_sd)
    names = names_layout + names_df
    groups = opt_sd.get("param_groups", [])
    n_opt = sum(len(g.get("params", [])) for g in groups)
    if n_opt != len(names):
        raise ValueError(
            f"optimizer has {n_opt} params but layout+df expose "
            f"{len(names)} — cannot align moment order")
    state = opt_sd.get("state", {})

    def moment_sd(base_sd, offset, count, key):
        """Copy of base_sd with parameter tensors replaced by their
        moment (zeros when torch never touched the param)."""
        out = dict(base_sd)
        for j, name in enumerate(names[offset:offset + count]):
            ent = state.get(offset + j)
            out[name] = (_t2n(ent[key]) if ent is not None and key in ent
                         else np.zeros_like(_t2n(base_sd[name])))
        return out

    trees = {}
    for key in ("exp_avg", "exp_avg_sq"):
        lay, _ = import_reference_layout(
            moment_sd(layout_sd, 0, len(names_layout), key),
            **layout_kwargs)
        df = import_reference_unet(
            moment_sd(df_sd, len(names_layout), len(names_df), key),
            **unet_kwargs)
        trees[key] = {"layout": lay, "df": {"unet": df}}

    steps = [int(ent["step"]) for ent in state.values() if "step" in ent]
    count = max(steps) if steps else 0
    return trees["exp_avg"], trees["exp_avg_sq"], count


def seat_adam_moments(opt_state, mu, nu, count: int):
    """Seat converted moments into an optax chain state (adamw =
    scale_by_adam → add_decayed_weights → scale_by_learning_rate): the
    ScaleByAdamState gets (count, mu, nu); every other stateful link with a
    ``count`` (the LR schedule) gets the step counter so the reference's
    re-seated LambdaLR (VAE.py:146-148) is reproduced."""
    import jax.numpy as jnp
    c = jnp.asarray(count, jnp.int32)
    new = []
    for s in opt_state:
        fields = getattr(s, "_fields", ())
        if "mu" in fields and "nu" in fields:
            s = s._replace(count=c, mu=mu, nu=nu)
        elif "count" in fields:
            s = s._replace(count=c)
        new.append(s)
    return type(opt_state)(new) if isinstance(opt_state, list) \
        else tuple(new)


# ---------------------------------------------------------------------------
# v1_full (Graph-to-3D) checkpoint interop
# ---------------------------------------------------------------------------

def infer_reference_v1full_hparams(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Recover the v1_full Sg2ScVAEModel hyperparameters from its state dict
    (VAEGAN_V1FULL.py:13-188 construction rules). As with v2, pooling
    'sum' vs 'avg' is not recoverable (identical params) — returned 'avg';
    replace_latent is a forward-only flag with no parameters."""
    keys = set(sd.keys())
    ed = sd["obj_embeddings_ec_box.weight"].shape[1]
    num_obj = sd["obj_embeddings_ec_box.weight"].shape[0] - 1
    num_pred = sd["pred_embeddings_ec_box.weight"].shape[0]
    layers = 1 + max((int(k.split(".")[2]) for k in keys
                      if k.startswith("gconv_net_ec_box.gconvs.")), default=0)
    shared = 1 + max((int(k.split(".")[2]) for k in keys
                      if k.startswith("gconv_net_shared.gconvs.")), default=0)
    residual = any(".linear_projection." in k for k in keys
                   if k.startswith("gconv_net_ec_box."))
    pooling = "wAvg" if any(".weightNet." in k for k in keys) else "avg"
    use_angles = any(k.startswith("angle_net.") for k in keys)
    box_lin = sorted((k for k in keys if k.startswith("box_net.")
                      and k.endswith(".weight") and sd[k].ndim == 2),
                     key=lambda k: int(k.split(".")[1]))
    num_box_params = int(sd[box_lin[-1]].shape[0]) if box_lin else 6
    shape_input_dim = int(sd["shape_embeddings.weight"].shape[1])
    return {"embedding_dim": int(ed), "num_obj_classes": int(num_obj),
            "num_pred_classes": int(num_pred),
            "gconv_num_layers": int(layers),
            "gconv_num_shared_layers": int(shared),
            "residual": bool(residual), "gconv_pooling": pooling,
            "use_angles": bool(use_angles),
            "num_box_params": num_box_params,
            "shape_input_dim": shape_input_dim}


def import_reference_v1full(torch_state_dict: Dict[str, Any],
                            num_gcn_layers: int = 5,
                            num_shared_layers: int = 5,
                            pooling: str = "avg",
                            residual: bool = False,
                            use_angles: bool = True):
    """Reference v1_full ``Sg2ScVAEModel`` state dict (the whole-module
    .pth of model/VAE.py:110-115, module names VAEGAN_V1FULL.py:64-188) →
    our ``V1FullVAE`` parameter tree.

    Returns (params, batch_stats).
    """
    sd = {k: _t2n(v) for k, v in torch_state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    embeds = {
        "obj_embeddings_ec_box": "obj_embed_ec_box",
        "obj_embeddings_ec_shape": "obj_embed_ec_shape",
        "pred_embeddings_ec_box": "pred_embed_ec_box",
        "pred_embeddings_ec_shape": "pred_embed_ec_shape",
        "obj_embeddings_dc_box": "obj_embed_dc_box",
        "obj_embeddings_dc_man": "obj_embed_dc_man",
        "obj_embeddings_dc_shape": "obj_embed_dc_shape",
        "pred_embeddings_dc_box": "pred_embed_dc_box",
        "pred_embeddings_dc_shape": "pred_embed_dc_shape",
        "pred_embeddings_man_dc": "pred_embed_man_dc",
    }
    for src, dst in embeds.items():
        if f"{src}.weight" in sd:
            params[dst] = {"embedding": sd[f"{src}.weight"]}

    params["box_embed"] = convert_torch_linear(
        sd["box_embeddings.weight"], sd.get("box_embeddings.bias"))
    params["shape_embed"] = convert_torch_linear(
        sd["shape_embeddings.weight"], sd.get("shape_embeddings.bias"))
    if use_angles and "angle_embeddings.weight" in sd:
        params["angle_embed"] = {"embedding": sd["angle_embeddings.weight"]}

    mlps = ["box_mean_var", "box_mean", "box_var", "shape_mean_var",
            "shape_mean", "shape_var", "box_net", "shape_net"]
    if use_angles:
        mlps += ["angle_mean_var", "angle_mean", "angle_var", "angle_net"]
    for name in mlps:
        if any(k.startswith(name + ".") for k in sd):
            p, s = import_torch_mlp(sd, name)
            params[name] = p
            if s:
                stats[name] = s

    gcns = {"gconv_net_ec_box": ("gconv_ec_box", num_gcn_layers),
            "gconv_net_ec_shape": ("gconv_ec_shape", num_gcn_layers),
            "gconv_net_shared": ("gconv_shared", num_shared_layers),
            "gconv_net_dec_box": ("gconv_dec_box", num_gcn_layers),
            "gconv_net_dec_shape": ("gconv_dec_shape", num_gcn_layers),
            "gconv_net_manipulation": ("gconv_manipulation", num_gcn_layers)}
    for src, (dst, n_layers) in gcns.items():
        if not any(k.startswith(src + ".") for k in sd):
            continue
        sub = {k[len(src) + 1:]: v for k, v in sd.items()
               if k.startswith(src + ".")}
        p, s = import_reference_gcn(sub, "", n_layers, pooling, residual)
        params[dst] = p
        if s:
            stats[dst] = s
    return params, stats


def save_v1_checkpoint(path: str, state, epoch: int = 0) -> None:
    """v1_full counterpart of save_checkpoint: reference-like sub-trees
    (vae / aux shape discriminator / box discriminator / opt / meta)."""
    import orbax.checkpoint as ocp
    tree = {
        "vae": state.params,
        "batch_stats": {"vae": state.stats or {},
                        "aux": state.aux_stats or {},
                        "boxd": state.boxd_stats or {}},
        "aux": state.aux_params or {},
        "boxd": state.boxd_params or {},
        "opt": {"vae": state.opt, "aux": state.aux_opt,
                "boxd": state.boxd_opt},
        "meta": {"epoch": np.asarray(epoch),
                 "counter": np.asarray(state.step)},
    }
    tree = fetch_tree_chunked(tree, log_label=f"v1-epoch{epoch}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_v1_checkpoint(path: str, state):
    """Restore into a V1TrainState template; returns (state, epoch)."""
    import orbax.checkpoint as ocp
    template = {
        "vae": state.params,
        "batch_stats": {"vae": state.stats or {},
                        "aux": state.aux_stats or {},
                        "boxd": state.boxd_stats or {}},
        "aux": state.aux_params or {},
        "boxd": state.boxd_params or {},
        "opt": {"vae": state.opt, "aux": state.aux_opt,
                "boxd": state.boxd_opt},
        "meta": {"epoch": np.asarray(0),
                 "counter": _counter_template(state.step)},
    }
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path), target=template)
    new_state = state.replace(
        step=jax.numpy.asarray(tree["meta"]["counter"]),
        params=tree["vae"], stats=tree["batch_stats"]["vae"],
        aux_params=tree["aux"], aux_stats=tree["batch_stats"]["aux"],
        boxd_params=tree["boxd"], boxd_stats=tree["batch_stats"]["boxd"],
        opt=tree["opt"]["vae"], aux_opt=tree["opt"]["aux"],
        boxd_opt=tree["opt"]["boxd"])
    return new_state, int(tree["meta"]["epoch"])
