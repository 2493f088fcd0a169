"""v1_full checkpoint unification (VERDICT r2 #8): reference Graph-to-3D
whole-module .pth → import_checkpoint → orbax sub-tree layout →
eval CLI, all through the same surface as v2_full."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import tests.test_torch_parity  # noqa: F401, E402  (puts /root/reference on sys.path)


def _ref_v1full(n_obj=12, n_pred=16, ed=16):
    from model.VAEGAN_V1FULL import Sg2ScVAEModel
    # num_objs = len(set(object_idx_to_name)) must equal our
    # vocab.num_obj_classes (12 incl. '_scene_' for Vocab.synthetic())
    vocab = {"object_idx_to_name": [f"c{i}" for i in range(n_obj)],
             "pred_idx_to_name": [f"p{i}" for i in range(n_pred)]}
    torch.manual_seed(5)
    return Sg2ScVAEModel(
        vocab, embedding_dim=ed, decoder_cat=True,
        mlp_normalization="batch", gconv_num_layers=2,
        gconv_num_shared_layer=2, with_changes=True, use_angles=True,
        distribution_before=True, replace_latent=True, num_box_params=6,
        residual=False, shape_input_dim=256)


@pytest.fixture(scope="module")
def v1_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("v1import"))
    ref = _ref_v1full()
    pth = os.path.join(root, "model12.pth")
    # the reference saves the WHOLE module and load_networks does
    # torch.load(...).state_dict() (model/VAE.py:110-115)
    torch.save(ref, pth)

    exp = os.path.join(root, "exp")
    from commonscenes_tpu.cli.import_checkpoint import main
    epoch = main(["--pth", pth, "--exp", exp, "--epoch", "12"])
    assert epoch == 12
    return ref, exp


def test_v1full_import_writes_unified_layout(v1_exp):
    ref, exp = v1_exp
    assert os.path.isdir(os.path.join(exp, "checkpoint", "model_12"))
    with open(os.path.join(exp, "args.json")) as f:
        meta = json.load(f)
    assert meta["network_type"] == "v1_full"
    assert meta["layout"]["embedding_dim"] == 16
    assert meta["layout"]["gconv_num_layers"] == 2


def test_v1full_restore_matches_torch_weights(v1_exp):
    """Restored orbax tree carries the converted reference weights — the
    same sub-tree surface save_v1_checkpoint/restore_v1_checkpoint use."""
    import jax
    import jax.numpy as jnp

    from commonscenes_tpu.core.config import FullConfig
    from commonscenes_tpu.data.collate import collate
    from commonscenes_tpu.data.synthetic import make_scene
    from commonscenes_tpu.data.vocab import Vocab
    from commonscenes_tpu.models.v1_full import (V1FullVAE,
                                                 pseudo_shape_codes)
    from commonscenes_tpu.train.checkpoints import restore_v1_checkpoint
    from commonscenes_tpu.train.step_v1full import V1FullTrainer

    ref, exp = v1_exp
    vocab = Vocab.synthetic()
    cfg = FullConfig()
    model = V1FullVAE(num_obj_classes=vocab.num_obj_classes,
                      num_pred_classes=vocab.num_pred_classes,
                      embedding_dim=16, gconv_num_layers=2,
                      gconv_num_shared_layers=2, use_angles=True,
                      shape_input_dim=256)
    trainer = V1FullTrainer(cfg, model, vocab.num_obj_classes,
                            vocab.num_pred_classes)
    rng = np.random.RandomState(0)
    scenes = [make_scene(vocab, rng, num_objs=4, with_clip=False)
              for _ in range(2)]
    batch = collate(scenes, vocab, cfg.batch.__class__(
        batch_size=2, max_objs=cfg.batch.max_objs,
        max_triples=cfg.batch.max_triples, diffusion_bs=2,
        sdf_res=cfg.batch.sdf_res), rng, use_clip=False)
    codes = jnp.asarray(pseudo_shape_codes(np.asarray(batch.dec.objs),
                                           dim=256))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, codes)
    state, epoch = restore_v1_checkpoint(
        os.path.join(exp, "checkpoint", "model_12"), state)
    assert epoch == 12

    np.testing.assert_allclose(
        np.asarray(state.params["obj_embed_ec_box"]["embedding"]),
        ref.obj_embeddings_ec_box.weight.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.params["box_embed"]["kernel"]),
        ref.box_embeddings.weight.detach().numpy().T, rtol=1e-6)
    # BN running stats land in batch_stats
    np.testing.assert_allclose(
        np.asarray(state.stats["box_mean_var"]["bn_0"]["mean"]),
        ref.box_mean_var[1].running_mean.numpy(), rtol=1e-6)


def test_v1full_eval_cli_on_imported_exp(v1_exp):
    """The imported v1_full experiment evaluates through the standard eval
    CLI (same surface as v2_full)."""
    from commonscenes_tpu.cli.eval_3dfront import main
    ref, exp = v1_exp
    s = main(["--exp", exp, "--epoch", "12", "--dataset", "synthetic",
              "--num_scenes", "2", "--eval_batch", "2"])
    assert s["network_type"] == "v1_full"
    assert np.isfinite(s["scenes_per_sec"])
