"""Host-streamed sharded training (train/stream_data.py).

- shard_plan cuts at (scene, mov, noise) group boundaries only
- a single-shard streamed run is BITWISE-equal to fit_device_data (same
  global shuffle, same crop keying, same on-device slice path)
- a multi-shard run trains every window exactly once per epoch
"""
import dataclasses
import os

import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.config import ModelOptions, TrainOptions
from ai_path_tracer_denoiser_tpu.data.dataset import SequenceDataset
from ai_path_tracer_denoiser_tpu.train import fit_device_data
from ai_path_tracer_denoiser_tpu.train.stream_data import (
    fit_streamed, group_ranges, shard_plan)
from ai_path_tracer_denoiser_tpu.train.trainer import init_train_state


def tiny_corpus(tmp_path, scenes=2, movs=1, seeds=2, frames=8, res=64):
    rng = np.random.default_rng(0)
    xdir = tmp_path / "input"
    ydir = tmp_path / "gt"
    xdir.mkdir()
    ydir.mkdir()
    for s in range(scenes):
        for mv in range(movs):
            for nz in range(seeds):
                for f in range(frames):
                    name = f"{s:03d}_{mv}_{nz}_{f:04d}.npy"
                    np.save(xdir / name,
                            rng.random((res, res, 10), np.float32).astype(np.float32))
                    np.save(ydir / name,
                            rng.random((res, res, 3), np.float32))
    return SequenceDataset(str(xdir), str(ydir), sequence_length=4,
                           crop=True, crop_size=32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return tiny_corpus(tmp_path_factory.mktemp("corpus"))


def small_opts():
    topt = TrainOptions(batch_size=2, sequence_length=4, crop_size=32,
                        bf16_compute=False, epochs=1,
                        checkpoint_every_epochs=10)
    mopt = ModelOptions(widths=(8, 8, 8, 8, 8))
    return topt, mopt


def test_shard_plan_respects_groups(corpus):
    ranges = group_ranges(corpus)
    assert sum(e - s for s, e in ranges) == len(corpus)
    shards = shard_plan(corpus, max_frames=10)
    bounds = {s for s, _ in ranges} | {e for _, e in ranges}
    for s, e in shards:
        assert s in bounds and e in bounds          # cuts on group edges
    assert shards[0][0] == 0 and shards[-1][1] == len(corpus)
    with pytest.raises(ValueError):
        shard_plan(corpus, max_frames=4)            # smaller than a group


def test_single_shard_matches_device_resident(corpus):
    import jax
    topt, mopt = small_opts()
    s1 = init_train_state(jax.random.PRNGKey(0), mopt, topt)
    s2 = init_train_state(jax.random.PRNGKey(0), mopt, topt)
    a = fit_device_data(s1, corpus, topt, epochs=1, model_options=mopt)
    b = fit_streamed(s2, corpus, topt, epochs=1, model_options=mopt,
                     shard_frames=len(corpus))
    for la, lb in zip(jax.tree_util.tree_leaves(a.params),
                      jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert int(a.step) == int(b.step)


def test_multi_shard_trains_all_windows(corpus):
    import jax
    topt, mopt = small_opts()
    st = init_train_state(jax.random.PRNGKey(0), mopt, topt)
    out = fit_streamed(st, corpus, topt, epochs=1, model_options=mopt,
                       shard_frames=16)
    # 32 frames, batch 2 -> 16 steps when shards divide evenly
    assert int(out.step) == len(corpus) // topt.batch_size
    for leaf in __import__("jax").tree_util.tree_leaves(out.params):
        assert np.isfinite(np.asarray(leaf)).all()
