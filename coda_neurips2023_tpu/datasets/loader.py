"""Batch loader: host-side prefetching collate over map-style datasets.

Replaces torch DataLoader + DistributedSampler (reference main.py:1004-1035):
under single-controller SPMD one loader feeds the GLOBAL batch; there is no
per-rank sampler.  A small thread pool overlaps sample assembly (numpy
augmentations, image IO) with device compute, and string-valued fields are
split out of the array batch (kept on host for the pseudo-label writer).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, Optional

import numpy as np

_STRING_KEYS = ("im_name", "pseudo_box_path", "calib_name")


def collate(samples: list) -> dict:
    batch = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if k in _STRING_KEYS or isinstance(vals[0], str):
            batch[k] = list(vals)
        else:
            batch[k] = np.stack([np.asarray(v) for v in vals])
    return batch


class Loader:
    def __init__(self, dataset, batch_size, shuffle=False, seed=0, drop_last=True,
                 num_workers=4, pad_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        # pad_last: keep static jit shapes while evaluating EVERY sample
        # (reference eval DataLoaders never drop the tail, main.py:1027-1033):
        # the final short batch is padded by repeating its last sample and a
        # per-row "pad_mask" marks real rows; engine.evaluate slices them out
        # before the AP meter.
        self.pad_last = pad_last and not drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_batch(self, idxs):
        samples = [self.dataset[i] for i in idxs]
        n_valid = len(samples)
        if self.pad_last and n_valid < self.batch_size:
            samples = samples + [samples[-1]] * (self.batch_size - n_valid)
        batch = collate(samples)
        if self.pad_last:
            mask = np.zeros(len(samples), np.bool_)
            mask[:n_valid] = True
            batch["pad_mask"] = mask
        return batch

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        end = n - (n % self.batch_size) if self.drop_last else n
        if self.num_workers > 1:
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                futures = []
                for start in range(0, end, self.batch_size):
                    idxs = order[start : start + self.batch_size]
                    futures.append(pool.submit(self._make_batch, idxs))
                    # bounded pipeline: keep at most 2 batches in flight
                    while len(futures) > 2:
                        yield futures.pop(0).result()
                for f in futures:
                    yield f.result()
        else:
            for start in range(0, end, self.batch_size):
                idxs = order[start : start + self.batch_size]
                yield self._make_batch(idxs)


def make_loader(dataset, batch_size, shuffle=False, seed=0, drop_last=True,
                num_workers=4, pad_last=False):
    return Loader(dataset, batch_size, shuffle, seed, drop_last, num_workers,
                  pad_last=pad_last)
