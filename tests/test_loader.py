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
