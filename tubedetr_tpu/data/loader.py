"""Batched data loading with background prefetch.

Replaces torch's DataLoader+DistributedSampler (/root/reference/main.py:
433-516). Per-process sharding (each JAX process loads its slice of the
global batch), shuffling with per-epoch reseeding (``set_epoch`` semantics),
drop_last batching for train, and a thread-pool prefetcher that overlaps
decode/transform with device compute (double-buffered host->device feed,
SURVEY.md §7 hard part 3). The native C++ staging loader
(tubedetr_tpu/native) slots in underneath for the uint8 frame unpack/pad
hot path when built.
"""

from __future__ import annotations

import math
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Iterator, List, Sequence

import numpy as np

from tubedetr_tpu.data.collate import VideoSample, collate, split_video_into_clips


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        t: int,
        stride: int,
        max_text_len: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 42,
        num_workers: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        div_vid: int = 0,
        with_fast: bool = True,
        tokenizer=None,
        prefetch: int = 2,
        frames_dtype="float32",
        compact_pad_masks: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.t = t
        self.stride = stride
        self.max_text_len = max_text_len
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self.div_vid = div_vid
        self.with_fast = with_fast
        self.tokenizer = tokenizer
        self.prefetch = prefetch
        self.frames_dtype = frames_dtype
        self.compact_pad_masks = compact_pad_masks
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-process contiguous-strided shard (DistributedSampler semantics)
        return list(idx[self.process_index :: self.process_count])

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _make_batch(self, sample_group: List[VideoSample]):
        if self.div_vid:
            clips: List[VideoSample] = []
            for s in sample_group:
                clips.extend(split_video_into_clips(s, self.div_vid))
            sample_group = clips
            t = self.div_vid
        else:
            t = self.t
        return collate(
            sample_group,
            t,
            self.stride,
            self.max_text_len,
            tokenizer=self.tokenizer,
            with_fast=self.with_fast,
            frames_dtype=self.frames_dtype,
            compact_pad_masks=self.compact_pad_masks,
        )

    def __iter__(self) -> Iterator:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            for bidx in batches:
                yield self._make_batch([self.dataset[i] for i in bidx])
            return

        # pipelined: worker threads fetch samples; a bounded queue keeps
        # `prefetch` collated batches ready ahead of the training step
        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for bidx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, bidx))
                    q.put(self._make_batch(samples))
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Overlap host->device batch transfer with device compute (double
    buffering): a background thread ``jax.device_put``s the ndarray leaves
    of batch k+1..k+size while the step for batch k runs, so the transfer
    streams over PCIe (or the axon tunnel) behind the compute. The
    single/multi-device analogue of ``flax.jax_utils.prefetch_to_device``
    for the (batch, meta) tuples our DataLoader yields; meta stays on host.

    ``put_fn`` overrides the placement (default: ``jax.device_put`` each
    ndarray field) — e.g. ``lambda b: shard_batch(b, mesh)`` places each
    field with its mesh sharding so the jitted step consumes committed
    global arrays with zero relayout.
    """

    def __init__(self, loader, size: int = 2, put_fn=None):
        self.loader, self.size, self.put_fn = loader, size, put_fn

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import jax

        q: Queue = Queue(maxsize=self.size)
        stop = threading.Event()
        END = object()

        put_fn = self.put_fn or (
            lambda batch: {
                k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in batch.items()
            }
        )

        def producer():
            try:
                for batch, meta in self.loader:
                    if stop.is_set():
                        return
                    q.put((put_fn(batch), meta))
                q.put(END)
            except BaseException as e:  # surface loader errors to consumer
                q.put(e)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer waiting on a full queue
            while th.is_alive() and not q.empty():
                try:
                    q.get_nowait()
                except Exception:
                    break


class ConcatDataset:
    """Concatenation of datasets (reference ConcatDataset over
    combine_datasets, /root/reference/main.py:426-432)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx: int):
        di = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        return self.datasets[di][idx - int(self.offsets[di])]

    def set_epoch(self, epoch: int):
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)


class EpochChunkView:
    """--epoch_chunks round-robin chunking (/root/reference/main.py:433-464):
    splits the index space into chunks so checkpoints/eval happen more often
    on time-limited clusters."""

    def __init__(self, dataset, n_chunks: int, chunk: int, seed: int = 42):
        n = len(dataset)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        per = math.ceil(n / n_chunks)
        self.indices = perm[chunk * per : (chunk + 1) * per]
        self.dataset = dataset

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self.indices[i])]

    def set_epoch(self, epoch: int):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
