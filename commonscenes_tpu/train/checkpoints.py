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


def save_checkpoint(path: str, state, epoch: int = 0) -> None:
    """Write the TrainState with reference-like sub-trees via orbax."""
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
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (shapes must match)."""
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
        "meta": {"epoch": np.asarray(0), "counter": np.asarray(state.step)},
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
