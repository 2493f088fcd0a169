"""Tests for the padding collate + manipulation modes + SDF selection."""

import numpy as np

from commonscenes_tpu.core.config import BatchConfig
from commonscenes_tpu.data.collate import collate
from commonscenes_tpu.data.synthetic import SyntheticDataset, make_scene
from commonscenes_tpu.data.vocab import Vocab

VOCAB = Vocab.synthetic()
CFG = BatchConfig(batch_size=2, max_objs=12, max_triples=64, diffusion_bs=4,
                  sdf_res=16)


def make_scenes(n=2, sdf=True, seed=0):
    rng = np.random.RandomState(seed)
    return [make_scene(VOCAB, rng, num_objs=6, sdf_res=16 if sdf else 0)
            for _ in range(n)], rng


def test_collate_shapes():
    scenes, rng = make_scenes()
    batch = collate(scenes, VOCAB, CFG, rng, with_shapes=True)
    assert batch.dec.objs.shape == (2, 12)
    assert batch.dec.triples.shape == (2, 64, 3)
    assert batch.dec.boxes.shape == (2, 12, 6)
    assert batch.dec.text_feats.shape == (2, 12, 512)
    assert batch.shapes.sdf.shape == (4, 16, 16, 16, 1)
    assert batch.shapes.mask.sum() > 0


def test_addition_mode_hides_node():
    scenes, rng = make_scenes(seed=1)
    batch = collate(scenes, VOCAB, CFG, rng,
                    manipulation_modes=("addition",))
    node_new = np.asarray(batch.node_new)
    assert node_new.sum() == 2  # one added node per scene
    enc_mask = np.asarray(batch.enc.obj_mask)
    dec_mask = np.asarray(batch.dec.obj_mask)
    # encoder hides exactly the added node
    np.testing.assert_array_equal(dec_mask - enc_mask, node_new)
    # no encoder triple touches the hidden node
    for b in range(2):
        hid = np.where(node_new[b] > 0)[0][0]
        tm = np.asarray(batch.enc.triple_mask[b]) > 0
        tr = np.asarray(batch.enc.triples[b])[tm]
        assert not np.any((tr[:, 0] == hid) | (tr[:, 2] == hid))


def test_relationship_mode_changes_predicate():
    scenes, rng = make_scenes(seed=2)
    batch = collate(scenes, VOCAB, CFG, rng,
                    manipulation_modes=("relationship",))
    changed = np.asarray(batch.node_changed)
    enc_t = np.asarray(batch.enc.triples)
    dec_t = np.asarray(batch.dec.triples)
    total_changed_triples = 0
    for b in range(2):
        diff = (enc_t[b] != dec_t[b]).any(axis=1)
        total_changed_triples += int(diff.sum())
        if diff.sum():
            k = np.where(diff)[0][0]
            # only the predicate differs
            assert enc_t[b, k, 0] == dec_t[b, k, 0]
            assert enc_t[b, k, 2] == dec_t[b, k, 2]
            assert enc_t[b, k, 1] != dec_t[b, k, 1]
            s, o = dec_t[b, k, 0], dec_t[b, k, 2]
            assert changed[b, s] == 1 and changed[b, o] == 1
    assert total_changed_triples >= 1


def test_keep_mask():
    scenes, rng = make_scenes(seed=3)
    batch = collate(scenes, VOCAB, CFG, rng, manipulation_modes=("addition",))
    keep = np.asarray(batch.keep_mask)
    node_new = np.asarray(batch.node_new)
    dec_mask = np.asarray(batch.dec.obj_mask)
    np.testing.assert_array_equal(keep, dec_mask * (1 - node_new))


def test_sdf_selection_balanced():
    scenes, rng = make_scenes(seed=4)
    batch = collate(scenes, VOCAB, CFG, rng, with_shapes=True)
    sb = batch.shapes
    real = np.asarray(sb.mask) > 0
    assert real.sum() == 4
    # selected slots actually have SDFs
    for i in np.where(real)[0]:
        si, oi = int(sb.scene_idx[i]), int(sb.slot_idx[i])
        assert scenes[si].has_sdf[oi]
        assert np.abs(np.asarray(sb.sdf[i])).max() > 0


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(VOCAB, num_scenes=4, sdf_res=0, seed=7)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a.objs, b.objs)
    np.testing.assert_array_equal(a.triples, b.triples)
