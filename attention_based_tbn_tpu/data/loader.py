"""Threaded, prefetching data loader feeding the device.

The reference forks ``num_workers`` DataLoader processes per epoch
(reference core/utils/create_dataloader.py:122-124). Here a thread pool
decodes samples (cv2/numpy release the GIL), batches collate to pinned
numpy, and a double-buffered prefetcher overlaps host decode + H2D transfer
with device compute. Visual streams travel as uint8 (4x less transfer);
normalization happens on device (models/tbn.py:_normalize).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import VideoDataset


def collate(samples: Sequence[Dict]) -> Tuple[Dict, Dict, Dict]:
    """List of sample dicts -> (batch arrays, targets, metadata)."""
    batch: Dict = {}
    targets: Dict = {"class": {}}
    meta: Dict = {
        "uid": [s["uid"] for s in samples],
        "vid_id": [s["vid_id"] for s in samples],
        "start_time": [s["start_time"] for s in samples],
        "stop_time": [s["stop_time"] for s in samples],
    }

    for key in ("RGB", "Flow", "Audio"):
        if key in samples[0]:
            batch[key] = np.stack([s[key] for s in samples])
    if "weights" in samples[0] and samples[0]["weights"] is not None:
        batch["weights"] = np.stack([s["weights"] for s in samples])
    if "target_weights" in samples[0] and samples[0]["target_weights"] is not None:
        targets["weights"] = np.stack([s["target_weights"] for s in samples])

    labels = [s["labels"] for s in samples]
    if isinstance(labels[0], dict):
        for key in labels[0]:
            targets["class"][key] = np.asarray([l[key] for l in labels], np.int32)
    else:
        targets["class"] = None  # unlabeled test csv (S1/S2)
    return batch, targets, meta


def pad_batch(batch, targets, total: int):
    """Pad every leading batch dim to ``total`` rows by repeating the first
    sample, so the global batch divides the device mesh. Metrics and result
    collection must use the true batch size (meta["batch_size"])."""

    def pad(x):
        x = np.asarray(x)
        if x.shape[0] >= total:
            return x
        return np.concatenate([x, np.repeat(x[:1], total - x.shape[0], axis=0)])

    import jax

    return jax.tree.map(pad, batch), jax.tree.map(pad, targets)


class DataLoader:
    """Iterates (batch, targets, meta) with background decode + prefetch."""

    def __init__(
        self,
        dataset: VideoDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        device_put=None,
        pad_to: int = 1,
        shard: Optional[Tuple[int, int]] = None,
        pack_visual: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(int(num_workers), 1)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(int(prefetch), 1)
        self.device_put = device_put
        # Pad each batch to a multiple of ``pad_to`` (the mesh size) in the
        # producer thread, so padding + H2D overlap device compute instead
        # of sitting on the training loop's critical path. The true batch
        # size travels in meta["batch_size"].
        self.pad_to = max(int(pad_to), 1)
        # Column-pair RGB/Flow streams on the host, (B, N, H, W, C) ->
        # (B, N, H, W/2, 2C) — a free numpy reshape here vs ~3 ms/batch of
        # device relayout copies when the packed stem (layers.TorchConv)
        # reshapes on device. Only valid for the BN-Inception packed stem.
        self.pack_visual = bool(pack_visual)
        # Multi-host data parallelism: (process_index, process_count). The
        # GLOBAL batch order is identical on every host (same seed/epoch);
        # each host decodes only its contiguous 1/count slice of every
        # global batch, index-padded to the full global batch size FIRST so
        # local slices have equal size on every host — required for the
        # jax.make_array_from_process_local_data assembly in
        # parallel/mesh.shard_batch. meta["batch_size"] stays the GLOBAL
        # true (unpadded) size.
        self.shard = shard
        if shard is not None:
            index, count = shard
            assert 0 <= index < count, shard
            assert batch_size % count == 0, (
                f"process count {count} must divide the global batch "
                f"size {batch_size}"
            )
            # pad_to is the GLOBAL device count; each host pads its local
            # rows to its local share of the mesh
            self.pad_to = max(self.pad_to // count, 1)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _assemble(self, samples, true_bs: int, global_idx) -> Tuple[Dict, Dict, Dict]:
        """Collate decoded samples into one (batch, targets, meta) triple:
        pad to the mesh multiple, host-pack visual streams, device_put —
        the single assembly path for the producer thread and probe_batch."""
        batch, targets, meta = collate(samples)
        # GLOBAL true size (multi-host shards report the whole batch's),
        # local rows for padding
        meta["batch_size"] = true_bs
        meta["global_indices"] = global_idx
        local_bs = len(samples)
        padded = ((local_bs + self.pad_to - 1) // self.pad_to) * self.pad_to
        if padded != local_bs:
            batch, targets = pad_batch(batch, targets, padded)
        if self.pack_visual:
            for key in ("RGB", "Flow"):
                arr = batch.get(key)
                if (
                    arr is not None
                    and arr.ndim == 5
                    and arr.shape[3] % 2 == 0
                    # mirror the model-side packed-input detection
                    # (models/tbn.py), which only fires for uint8 streams —
                    # packing a float stream here would feed the stem an
                    # undetected (W/2, 2C) tensor
                    and arr.dtype == np.uint8
                ):
                    b_, n_, h_, w_, c_ = arr.shape
                    batch[key] = np.ascontiguousarray(arr).reshape(
                        b_, n_, h_, w_ // 2, 2 * c_
                    )
        if self.device_put is not None:
            batch = self.device_put(batch)
            targets = self.device_put(targets)
        return batch, targets, meta

    def probe_batch(self) -> Tuple[Dict, Dict, Dict]:
        """One synchronously assembled single-sample batch (padded/packed/
        device_put exactly like the producer's) for shape probing and
        model.init — avoids spinning the full prefetch pipeline, which
        would decode (and then discard) up to ``prefetch`` extra batches
        and re-decode batch 0 when real iteration starts."""
        rng = np.random.default_rng((self.seed, 0, 0))
        samples = [self.dataset.sample(0, rng)]
        return self._assemble(samples, 1, np.asarray([0]))

    def _index_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # tuple seeding: (seed, epoch) streams never collide, unlike
            # seed + epoch (seed 0/epoch 1 would replay seed 1/epoch 0)
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Tuple[Dict, Dict, Dict]]:
        order = self._index_order()
        batches: List[np.ndarray] = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        true_sizes = [len(b) for b in batches]
        # Global (pre-shard, pre-pad) dataset indices per batch: multi-host
        # result saving rebuilds the GLOBAL uid order from these — every
        # host computes the same list, so no cross-process gather is needed
        # (tools/test.py save path).
        global_indices = [b.copy() for b in batches]
        if self.shard is not None:
            index, count = self.shard
            # Pad the GLOBAL batch (at the index level) to a multiple of
            # count * local pad_to BEFORE slicing, so (a) every host's
            # slice has equal size and (b) all pad rows land at the TAIL of
            # the assembled global batch — the metrics mask
            # (utils/metrics.py) trims trailing rows beyond the true size.
            # Per-host tail padding would interleave pads mid-batch.
            chunk = count * self.pad_to
            sharded = []
            for b in batches:
                padded = max(-(-len(b) // chunk) * chunk, chunk)
                if len(b) < padded:
                    b = np.concatenate(
                        [b, np.repeat(b[:1], padded - len(b))]
                    )
                local = padded // count
                sharded.append(b[index * local : (index + 1) * local])
            batches = sharded

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def sample_one(index):
            rng = np.random.default_rng(
                (self.seed, self.epoch, int(index))
            )
            return self.dataset.sample(int(index), rng)

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_no, idx in enumerate(batches):
                        if stop.is_set():
                            return
                        samples = list(pool.map(sample_one, idx))
                        out_queue.put(
                            self._assemble(
                                samples,
                                true_sizes[batch_no],
                                global_indices[batch_no],
                            )
                        )
                out_queue.put(None)
            except BaseException as exc:  # propagate decode errors to consumer
                out_queue.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can exit
            while True:
                try:
                    out_queue.get_nowait()
                except queue.Empty:
                    break


def visual_packing_enabled(cfg) -> bool:
    """Host-side column packing applies to the BN-Inception packed stem
    only (and is pointless under the direct-stem A/B)."""
    return (
        cfg.model.arch == "bninception"
        and not bool(cfg.get_path("tpu.direct_stem", False))
        and bool(cfg.get_path("tpu.pack_visual_host", True))
    )


def create_dataloader(
    cfg, modality, mode: str = "train", device_put=None, pad_to: int = 1
) -> DataLoader:
    """Reference create_dataloader surface (core/utils/create_dataloader.py):
    val reuses the train annotation file; batch size and split per mode."""
    from .records import read_vid_list, resolve_vid_list_path

    section = {"train": cfg.train, "val": cfg.val, "test": cfg.test}[mode]
    annotation_file = (
        cfg.train.annotation_file if mode in ("train", "val") else cfg.test.annotation_file
    )
    if isinstance(annotation_file, (list, tuple)):
        annotation_file = annotation_file[0]

    vid_list = None
    if section.vid_list:
        vid_list = read_vid_list(resolve_vid_list_path(section.vid_list))

    dataset = VideoDataset(cfg, vid_list, annotation_file, modality, mode=mode)

    shard = None
    import jax

    if jax.process_count() > 1:
        # multi-host SPMD: each host decodes its slice of the global batch
        # (see DataLoader.shard; parallel/mesh.shard_batch assembles the
        # global arrays)
        shard = (jax.process_index(), jax.process_count())

    return DataLoader(
        dataset,
        batch_size=int(section.batch_size),
        shuffle=(mode == "train"),
        num_workers=int(cfg.num_workers),
        seed=int(cfg.data.manual_seed),
        prefetch=int(cfg.get_path("tpu.prefetch", 2) or 2),
        device_put=device_put,
        pad_to=pad_to,
        shard=shard,
        pack_visual=visual_packing_enabled(cfg),
    )
