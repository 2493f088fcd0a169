"""Input-pipeline overlap (BatchPrefetcher) + training-time sample visuals."""

import os

import jax
import numpy as np
import pytest

from commonscenes_tpu.data.prefetch import BatchPrefetcher


@pytest.mark.fast
def test_prefetcher_yields_all_batches_in_order():
    out = list(BatchPrefetcher(lambda i: i * 10, num_steps=7, depth=2))
    assert out == [0, 10, 20, 30, 40, 50, 60]


@pytest.mark.fast
def test_prefetcher_skips_bad_batches():
    errors = []

    def make(i):
        if i in (1, 3):
            raise ValueError(f"bad scene {i}")
        return i

    pf = BatchPrefetcher(make, num_steps=4, depth=2,
                         on_error=lambda i, e: errors.append(i))
    out = list(pf)
    # a failed batch consumes its step (bounded epoch — a persistently
    # failing dataset must not hang the queue forever)
    assert out == [0, 2]
    assert errors == [1, 3]
    assert pf.skipped == 2


@pytest.mark.fast
def test_prefetcher_terminates_when_every_batch_fails():
    def always_bad(i):
        raise RuntimeError("corrupt")

    pf = BatchPrefetcher(always_bad, num_steps=5, depth=2)
    assert list(pf) == []
    assert pf.skipped == 5


@pytest.mark.fast
def test_prefetcher_overlaps_production():
    import time

    def slow_make(i):
        time.sleep(0.05)
        return i

    pf = BatchPrefetcher(slow_make, num_steps=4, depth=2)
    time.sleep(0.5)                  # producer should have filled the queue
    t0 = time.time()
    it = iter(pf)
    first = next(it)
    second = next(it)
    dt = time.time() - t0
    assert (first, second) == (0, 1)
    # two queue pops must beat two fresh 50 ms builds by a wide margin —
    # loose enough to survive scheduler noise on the loaded 1-core host
    assert dt < 0.09, f"prefetcher did not overlap production ({dt:.3f}s)"


def test_sample_visualizer_writes_png(tmp_path):
    from tests.test_train_step import make_batch, tiny_cfg, VOCAB
    from commonscenes_tpu.models.commonscenes import CommonScenesV2Full
    from commonscenes_tpu.utils.observability import SampleVisualizer

    cfg = tiny_cfg()
    model = CommonScenesV2Full(cfg, VOCAB.num_obj_classes,
                               VOCAB.num_pred_classes)
    batch = make_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    vis = SampleVisualizer(model, str(tmp_path), VOCAB.scene_class_id,
                           ddim_steps=3, max_shapes=2)
    path = vis(variables, batch, jax.random.PRNGKey(1), step=100)
    # random-init SDFs may triangulate to nothing; the call must succeed and
    # a produced file must be a valid PNG
    if path:
        assert os.path.exists(path)
        from commonscenes_tpu.eval.scene_export import load_png
        img = load_png(path)
        assert img.shape[0] == 128 and img.shape[2] == 3
