"""Input pipeline tests: sampler semantics, batch assembly, prefetch-thread
error propagation, per-host sharding (SURVEY.md §2.3 DistributedSampler +
L0 loader capability)."""
import numpy as np
import pytest

from saunet_tpu.data.loader import (
    ArrayDataLoader,
    BatchSampler,
    DistributedShardSampler,
    RandomSampler,
    SequentialSampler,
    SubsetRandomSampler,
    WeightedRandomSampler,
)


def test_sequential_and_random_samplers():
    assert list(SequentialSampler(5)) == [0, 1, 2, 3, 4]
    r = list(RandomSampler(10, np.random.RandomState(0)))
    assert sorted(r) == list(range(10))
    s = list(SubsetRandomSampler([2, 4, 6], np.random.RandomState(0)))
    assert sorted(s) == [2, 4, 6]


def test_weighted_sampler_bias():
    w = [0.0, 0.0, 1.0, 0.0]
    idx = list(WeightedRandomSampler(w, 50, rng=np.random.RandomState(0)))
    assert set(idx) == {2}


def test_batch_sampler_drop_last():
    bs = BatchSampler(SequentialSampler(10), 3, drop_last=True)
    assert list(bs) == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    assert len(bs) == 3
    bs2 = BatchSampler(SequentialSampler(10), 3, drop_last=False)
    assert list(bs2)[-1] == [9]
    assert len(bs2) == 4


def test_distributed_shard_sampler_partitions():
    n, shards = 103, 4
    all_idx = []
    for s in range(shards):
        smp = DistributedShardSampler(n, num_shards=shards, shard_id=s,
                                      seed=1)
        idx = list(smp)
        assert len(idx) == smp.shard_len
        all_idx.extend(idx)
    # every sample covered (with padding duplicates allowed)
    assert set(all_idx) == set(range(n))
    # per-epoch reshuffle is deterministic and different
    smp = DistributedShardSampler(n, num_shards=shards, shard_id=0, seed=1)
    smp.set_epoch(0)
    e0 = list(smp)
    smp.set_epoch(1)
    e1 = list(smp)
    assert e0 != e1
    smp.set_epoch(0)
    assert list(smp) == e0


def test_array_loader_batches_and_prefetch():
    arrays = {"x": np.arange(20).reshape(10, 2),
              "y": np.arange(10)}
    dl = ArrayDataLoader(arrays, batch_size=4, shuffle=True,
                         rng=np.random.RandomState(0))
    seen = []
    for batch in dl:
        assert batch["x"].shape == (4, 2)
        np.testing.assert_array_equal(batch["x"][:, 0] // 2, batch["y"])
        seen.extend(batch["y"].tolist())
    assert len(seen) == 8  # drop_last
    assert len(set(seen)) == 8


def test_loader_error_propagation():
    def bad_place(batch):
        raise RuntimeError("boom")

    dl = ArrayDataLoader({"x": np.arange(8)}, batch_size=2, place=bad_place)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


def test_loader_device_place():
    import jax
    from saunet_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(jax.devices(), data=8, space=1)
    arrays = {"image": np.random.RandomState(0)
              .rand(16, 8, 8, 1).astype(np.float32)}
    dl = ArrayDataLoader(arrays, batch_size=8,
                         place=lambda b: shard_batch(b, mesh))
    batches = list(dl)
    assert len(batches) == 2
    x = batches[0]["image"]
    assert hasattr(x, "sharding")
    assert x.shape == (8, 8, 8, 1)
