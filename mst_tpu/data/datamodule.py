"""DataModule: weighted sampling + batched on-device augmentation + prefetch.

Capability twin of the reference Lightning DataModule
(`mst/data/datamodules/datamodule.py`): the train loader uses weighted
sampling with replacement when class weights are given (seeded generator,
`drop_last=True`, reference :45-57), val/test iterate sequentially
(:61-78).

TPU-first differences:
- the torchio CPU transform chain running in 24 worker processes
  (reference `main_train.py:77`) becomes ONE jitted, vmapped device
  program applied to the whole batch (`DeviceAugment`);
- a background prefetch thread overlaps host decode of batch N+1 with
  device compute of batch N (double buffering into HBM);
- per-host sharding hooks (`shard_id`/`num_shards`) split the sample
  stream for multi-host data parallelism, replacing DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
import zlib
from typing import Iterator, Optional

import jax
import numpy as np

from mst_tpu.data.transforms import DeviceAugment


def _collate(samples):
    batch = {
        "uid": [s["uid"] for s in samples],
        "source": np.stack([s["source"] for s in samples]),
        "target": np.asarray([s["target"] for s in samples], np.int32),
    }
    if "mask" in samples[0]:
        batch["mask"] = np.stack([s["mask"] for s in samples])
    if "rater_masks" in samples[0]:
        batch["rater_masks"] = [s.get("rater_masks") for s in samples]
    if "affine" in samples[0]:
        batch["affine"] = np.stack([s["affine"] for s in samples])
    if "spacing_dhw" in samples[0]:
        batch["spacing_dhw"] = np.stack([s["spacing_dhw"] for s in samples])
    if "path" in samples[0]:
        batch["path"] = [s.get("path") for s in samples]
    batch["needs_padding_mask"] = bool(samples[0].get("needs_padding_mask", False))
    return batch


class DataModule:
    def __init__(
        self,
        ds_train=None,
        ds_val=None,
        ds_test=None,
        batch_size: int = 1,
        weights: Optional[np.ndarray] = None,
        num_train_samples: Optional[int] = None,
        seed: int = 0,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
        augment_on_device: bool = True,
        wire_dtype=np.float16,
    ):
        self.ds_train, self.ds_val, self.ds_test = ds_train, ds_val, ds_test
        self.batch_size = batch_size
        self.weights = None if weights is None else np.asarray(weights, np.float64)
        self.num_train_samples = num_train_samples
        self.seed = seed
        self.prefetch = prefetch
        self.shard_id, self.num_shards = shard_id, num_shards
        self.augment_on_device = augment_on_device
        # Volumes ship to the device in this dtype (the device pipeline
        # upcasts to f32). float16 halves host->HBM bytes and represents
        # the medical intensity ranges exactly enough (integers to 2048,
        # i.e. the full CT HU window).
        self.wire_dtype = wire_dtype
        self._epoch = 0
        self._augment_cache = {}

    # -- index sampling ----------------------------------------------------

    def _train_indices(self) -> np.ndarray:
        n = len(self.ds_train)
        num = self.num_train_samples or n
        if self.weights is None:
            # without-replacement sampling can only yield n indices; clamp
            # so the weighted and unweighted branches agree on epoch length
            # (and the multi-shard quantum below uses the achievable count)
            num = min(num, n)
        if self.num_shards > 1:
            # Equal per-host step counts (drop_last over the global stream):
            # SPMD training hangs if one host runs an extra step.
            quantum = self.num_shards * self.batch_size
            num -= num % quantum
            if num == 0:
                raise ValueError(
                    f"num_train_samples ({self.num_train_samples or n}) < "
                    f"num_shards * batch_size ({quantum}): every epoch would "
                    "train 0 steps — raise num_train_samples or lower the "
                    "per-host batch size"
                )
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.weights is not None:
            p = self.weights / self.weights.sum()
            idx = rng.choice(n, size=num, replace=True, p=p)
        else:
            idx = rng.permutation(n)[:num]
        return idx[self.shard_id :: self.num_shards]

    # -- augmentation ------------------------------------------------------

    def _augment(self, ds, batch, train: bool, offset: int = 0):
        # augment_on_device=False disables only the RANDOM train-time
        # augmentation; the deterministic device pipeline (normalisation,
        # resize, padding-mask derivation) always runs — it is required
        # preprocessing, not augmentation.
        train = train and self.augment_on_device
        cfg = ds.augment_config(train)
        key = (id(ds), train)
        if key not in self._augment_cache:
            self._augment_cache[key] = DeviceAugment(cfg, train)
        aug = self._augment_cache[key]
        b = batch["source"].shape[0]
        # Stable across processes (hash() is salted per interpreter).
        # The epoch POSITION is part of the seed: weighted sampling draws
        # the same uid multiple times per epoch and each occurrence must get
        # fresh augmentation randomness (torchio draws per occurrence);
        # (seed, epoch, position) stays deterministic for resume.
        seeds = np.asarray(
            [zlib.crc32(f"{self.seed}|{self._epoch}|{offset + i}|{u}".encode())
             for i, u in enumerate(batch["uid"])],
            np.uint32,
        )
        keys = jax.vmap(jax.random.PRNGKey)(seeds)
        if batch["needs_padding_mask"] and not cfg.has_mask:
            raise ValueError(
                "dataset requests src_key_padding_mask derivation but its "
                "AugmentConfig sets has_mask=False — the mask must ride "
                "through the device pipeline to stay consistent"
            )
        if cfg.has_mask:
            masks = batch.get("mask")
            if masks is None:
                masks = np.zeros((b, 1, *batch["source"].shape[2:]), np.uint8)
        else:
            # The pipeline never touches the mask: ship a tiny dummy instead
            # of 6 MB of zeros per batch over the host->device link.
            masks = np.zeros((b, 1, 1, 1, 1), np.uint8)
        src = batch["source"]
        # Downcast to the wire dtype only for value-range pipelines (LIDC HU
        # clamp/rescale: exact in f16). Raw-unit znorm datasets (DUKE/MRNet)
        # can exceed f16 range and must ship at full precision.
        if (self.wire_dtype is not None and isinstance(src, np.ndarray)
                and cfg.znorm_percentiles is None):
            src = src.astype(self.wire_dtype)
        vol, mask = aug(src, masks, keys)
        batch["source"] = vol
        if cfg.has_mask and ("mask" in batch or batch["needs_padding_mask"]):
            batch["mask"] = mask
        if batch["needs_padding_mask"]:
            m = np.asarray(mask)
            batch["src_key_padding_mask"] = ~(
                m[:, 0].sum(axis=(-1, -2)) > 0
            )  # [B, D] True = PAD (reference `dataset_3d_mrnet.py:82-88`)
        return batch

    # -- loaders -----------------------------------------------------------

    def _iter_batches(self, ds, indices, train: bool) -> Iterator[dict]:
        bs = self.batch_size
        n_full = len(indices) // bs if train else -(-len(indices) // bs)
        work_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        # Consumers may abandon the generator mid-epoch (limit_val_batches
        # breaks out of the loop every epoch): the stop event + timed puts
        # let the producer exit instead of blocking on a full queue forever
        # (one leaked thread + `prefetch` pinned batches per epoch).
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    work_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                prefetch = getattr(ds, "prefetch_decode", None)
                for bi in range(n_full):
                    chunk = indices[bi * bs : (bi + 1) * bs]
                    if len(chunk) == 0 or stop.is_set():
                        break
                    if prefetch is not None:
                        # Native pthread pool decodes the whole chunk's
                        # NIfTI files in parallel (no-op without libmstio).
                        prefetch([int(i) for i in chunk])
                    if not _put(_collate([ds[int(i)] for i in chunk])):
                        return
                _put(None)
            except BaseException as e:  # surface in the consumer, never hang
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # Device prefetch: dispatch batch k+1's transfer+augmentation before
        # yielding batch k, so the (potentially slow) host->device link
        # overlaps the consumer's train/eval step.
        pending = None
        consumed = 0
        try:
            while True:
                batch = work_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                current = self._augment(ds, batch, train, offset=consumed)
                consumed += len(batch["uid"])
                if pending is not None:
                    yield pending
                pending = current
            if pending is not None:
                yield pending
        finally:
            stop.set()

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the sampling epoch counter (resume support): the
        per-epoch index stream and augmentation seeds derive from
        (seed, epoch), so a resumed run re-enters the exact sequence."""
        self._epoch = int(epoch)

    def train_dataloader(self) -> Iterator[dict]:
        idx = self._train_indices()
        self._epoch += 1
        return self._iter_batches(self.ds_train, idx, train=True)

    def _padded_eval_stream(self, n: int) -> np.ndarray:
        """Global eval index stream, wrap-padded for multi-host equality.

        Multi-host eval runs SPMD collectives per batch and all-gathers
        equal-length metric buffers per epoch, so every host must see the
        same number of equally-sized batches: pad the global index list to
        a multiple of num_shards * batch_size by wrapping (np.resize tiles,
        so the pad is covered even when the split is smaller than one
        global batch). Positions >= n are the duplicates; both
        `_eval_indices` and `eval_valid_mask` derive from THIS stream so
        they cannot misalign."""
        idx = np.arange(n)
        if self.num_shards <= 1:
            return idx
        pad = (-n) % (self.num_shards * self.batch_size)
        return np.resize(idx, n + pad)

    def _eval_indices(self, n: int) -> np.ndarray:
        return self._padded_eval_stream(n)[self.shard_id :: self.num_shards]

    def eval_valid_mask(self, n: int) -> np.ndarray:
        """Host-local bool mask aligned with `_eval_indices(n)`: True for
        real samples, False for the wrap-padding duplicates. The trainer
        passes per-batch slices to `ClassificationMetrics.update` so the
        gathered epoch metrics dedup the pad exactly (a strict improvement
        on torch DistributedSampler semantics, which scores duplicates)."""
        stream = self._padded_eval_stream(n)
        real_first = np.arange(len(stream)) < n
        return real_first[self.shard_id :: self.num_shards]

    def val_dataloader(self) -> Iterator[dict]:
        return self._iter_batches(
            self.ds_val, self._eval_indices(len(self.ds_val)), train=False)

    def test_dataloader(self) -> Iterator[dict]:
        return self._iter_batches(
            self.ds_test, self._eval_indices(len(self.ds_test)), train=False)


def balanced_weights(labels: np.ndarray) -> np.ndarray:
    """Per-sample weights 0.5 / class_count (reference `main_train.py:62-68`)."""
    labels = np.asarray(labels).astype(int)
    counts = np.bincount(labels)
    w = 0.5 / np.maximum(counts, 1)
    return w[labels]
