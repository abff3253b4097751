"""DataLoader semantics: shuffling/epoch reseeding, per-process sharding,
drop_last, prefetch threads, ConcatDataset, EpochChunkView."""

import numpy as np

from tubedetr_tpu.data.loader import ConcatDataset, DataLoader, EpochChunkView
from tubedetr_tpu.data.synthetic import SyntheticDataset


def make_loader(ds, **kw):
    base = dict(batch_size=2, t=8, stride=2, max_text_len=8)
    base.update(kw)
    return DataLoader(ds, **base)


def test_batches_and_drop_last():
    ds = SyntheticDataset(n=7, t=8)
    dl = make_loader(ds, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    batch, meta = batches[0]
    assert batch["frames_fast"].shape[0] == 2
    assert len(meta["video_ids"]) == 2

    dl2 = make_loader(ds, drop_last=False)
    assert len(list(dl2)) == 4 == len(dl2)


def test_shuffle_reseeds_per_epoch():
    ds = SyntheticDataset(n=8, t=8)
    dl = make_loader(ds, shuffle=True, seed=7)
    dl.set_epoch(0)
    order0 = [m["video_ids"] for _, m in dl]
    dl.set_epoch(0)
    order0b = [m["video_ids"] for _, m in dl]
    dl.set_epoch(1)
    order1 = [m["video_ids"] for _, m in dl]
    assert order0 == order0b  # deterministic per epoch
    assert order0 != order1  # reshuffled across epochs


def test_process_sharding_partitions_dataset():
    ds = SyntheticDataset(n=8, t=8)
    seen = []
    for rank in range(2):
        dl = make_loader(
            ds, batch_size=1, process_index=rank, process_count=2
        )
        for _, m in dl:
            seen.extend(m["video_ids"])
    assert sorted(seen) == sorted(a.video_id for a in ds.annotations)
    assert len(seen) == len(set(seen))  # disjoint shards


def test_prefetch_threads_match_sync():
    ds = SyntheticDataset(n=6, t=8)
    sync = [m["video_ids"] for _, m in make_loader(ds)]
    threaded = [m["video_ids"] for _, m in make_loader(ds, num_workers=2)]
    assert sync == threaded


def test_concat_and_epoch_chunks():
    a, b = SyntheticDataset(n=3, t=8, seed=0), SyntheticDataset(n=4, t=8, seed=50)
    cat = ConcatDataset([a, b])
    assert len(cat) == 7
    assert cat[0].video_id == a[0].video_id
    assert cat[3].video_id == b[0].video_id

    chunks = [EpochChunkView(cat, 3, c, seed=1) for c in range(3)]
    ids = [s.video_id for ch in chunks for s in (ch[i] for i in range(len(ch)))]
    assert sorted(ids) == sorted(s.video_id for s in (cat[i] for i in range(7)))


def test_div_vid_loader_splits_clips():
    ds = SyntheticDataset(n=2, t=8)
    dl = make_loader(ds, batch_size=1, t=4, div_vid=4)
    batches = list(dl)
    # each 8-frame video becomes 2 clips of 4 frames in one batch
    batch, meta = batches[0]
    assert batch["frames_fast"].shape[:2] == (2, 4)
    assert meta["video_ids"][0] == meta["video_ids"][1]


def test_prefetch_to_device_preserves_order_and_count():
    import jax

    from tubedetr_tpu.parallel.mesh import make_mesh, prefetch_to_device

    ds = SyntheticDataset(n=6, t=8)
    dl = make_loader(ds, batch_size=2)
    mesh = make_mesh(data=2, time=1, devices=jax.devices()[:2])
    with mesh:
        out = list(prefetch_to_device(iter(dl), mesh, size=2))
    assert len(out) == 3
    sync_ids = [m["video_ids"] for _, m in dl]
    dev_ids = [m["video_ids"] for _, m in out]
    assert sync_ids == dev_ids
    # batches are device arrays sharded over the mesh
    b0 = out[0][0]
    assert hasattr(b0["frames_fast"], "sharding")


def test_collate_bf16_and_compact_masks_match_dense():
    """frames_dtype=bfloat16 + compact_pad_masks is the transfer-optimized
    input path (bf16 frames halve the host->device bytes; (B,T,2) valid
    extents replace the dense (B,T,H,W) pixel masks). The device-side
    expansion must reproduce collate's dense masks bit-exactly."""
    import ml_dtypes
    import numpy as np

    from tubedetr_tpu.parallel.train_step import model_inputs

    ds = SyntheticDataset(n=4, t=8)
    dense = list(make_loader(ds))
    compact = list(
        make_loader(ds, frames_dtype="bfloat16", compact_pad_masks=True)
    )
    assert len(dense) == len(compact)
    for (db, _), (cb, _) in zip(dense, compact):
        assert cb["frames_fast"].dtype == ml_dtypes.bfloat16
        assert "fast_pad_mask" not in cb and "slow_pad_mask" not in cb
        assert cb["fast_valid_hw"].shape == db["fast_pad_mask"].shape[:2] + (2,)
        # bf16 cast of the SAME normalized f32 frames
        np.testing.assert_array_equal(
            np.asarray(cb["frames_fast"], np.float32),
            db["frames_fast"].astype(ml_dtypes.bfloat16).astype(np.float32),
        )
        inputs = model_inputs(cb)
        np.testing.assert_array_equal(
            np.asarray(inputs["fast_pad_mask"]), db["fast_pad_mask"]
        )
        np.testing.assert_array_equal(
            np.asarray(inputs["slow_pad_mask"]), db["slow_pad_mask"]
        )


def test_device_prefetcher_matches_sync_feed():
    import numpy as np

    from tubedetr_tpu.data.loader import DevicePrefetcher

    ds = SyntheticDataset(n=6, t=8)
    dl = make_loader(ds, batch_size=2)
    sync = list(dl)
    pre = DevicePrefetcher(dl, size=2)
    assert len(pre) == len(dl)
    out = list(pre)
    assert [m["video_ids"] for _, m in out] == [
        m["video_ids"] for _, m in sync
    ]
    for (sb, _), (pb, _) in zip(sync, out):
        assert set(sb) == set(pb)
        for k in sb:
            assert not isinstance(pb[k], np.ndarray)  # device-resident
            np.testing.assert_array_equal(np.asarray(pb[k]), sb[k])
    # second epoch over the same prefetcher re-iterates cleanly
    assert len(list(pre)) == len(sync)


def test_device_prefetcher_propagates_loader_errors():
    import pytest

    from tubedetr_tpu.data.loader import DevicePrefetcher

    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            raise RuntimeError("decode failed")
            yield  # pragma: no cover

    with pytest.raises(RuntimeError, match="decode failed"):
        list(DevicePrefetcher(Boom(), size=1))
