"""Input pipeline tests: host sharding, threaded batching, device prefetch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu.data.loader import BatchLoader, DeviceLoader, host_shard
from setok_tpu.models.generate import _top_p_filter
from setok_tpu.parallel.mesh import data_sharding, make_mesh


class SquareDataset:
    def __len__(self):
        return 32

    def __getitem__(self, i):
        return {"x": np.full((4,), i, np.float32)}


def collate(items):
    return {"x": np.stack([it["x"] for it in items])}


def test_host_shard_partitions():
    idx = list(range(10))
    s0 = host_shard(idx, 0, 2)
    s1 = host_shard(idx, 1, 2)
    assert sorted(s0 + s1) == idx and not set(s0) & set(s1)


def test_batch_loader_covers_dataset():
    dl = BatchLoader(SquareDataset(), batch_size=8, collate=collate,
                     num_workers=2, seed=0)
    seen = []
    for batch in dl:
        assert batch["x"].shape == (8, 4)
        seen.extend(batch["x"][:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(32))
    assert len(dl) == 4


def test_device_loader_prefetch_and_sharding():
    mesh = make_mesh()
    bs = data_sharding(mesh)
    dl = BatchLoader(SquareDataset(), batch_size=8, collate=collate)
    dev = DeviceLoader(iter(dl), sharding=bs, prefetch=2)
    batches = list(dev)
    assert len(batches) == 4
    assert isinstance(batches[0]["x"], jax.Array)
    assert batches[0]["x"].sharding.is_equivalent_to(bs, 2)


def test_device_loader_propagates_errors():
    def bad():
        yield {"x": np.zeros((2,))}
        raise RuntimeError("boom")

    dev = DeviceLoader(bad())
    it = iter(dev)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_top_p_filter():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(_top_p_filter(logits, 0.75))
    assert np.isfinite(out[0, :2]).all()      # 0.5+0.3 ≥ 0.75 kept
    assert np.isinf(out[0, 3])                # tail dropped
    # top_p=1 keeps everything
    out = np.asarray(_top_p_filter(logits, 1.0))
    assert np.isfinite(out).all()
