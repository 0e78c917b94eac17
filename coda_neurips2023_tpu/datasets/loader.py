"""Batch loader: host-side prefetching collate over map-style datasets.

Replaces torch DataLoader + DistributedSampler (reference main.py:1004-1035):
under single-controller SPMD one loader feeds the GLOBAL batch; there is no
per-rank sampler.  String-valued fields are split out of the array batch
(kept on host for the pseudo-label writer).

Two worker backends:
  * threads (default): numpy/cv2 release the GIL for the heavy ops; fine for
    small batches and tests;
  * processes (use_processes=True, the CLI train path): real parallel sample
    assembly like the reference's 4-worker-per-GPU DataLoader
    (main.py:1027-1033).

Every backend builds each BATCH under a deterministic task seed against a
shallow dataset copy carrying its own rng, so augmentations are reproducible
regardless of worker scheduling or backend -- stronger than the reference's
per-worker np.random seeding (my_worker_init_fn).

`prefetch` bounds how many batches are in flight (reference: 2x workers).
"""

from __future__ import annotations

import concurrent.futures as cf
import copy
import multiprocessing as mp
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


# ---- process-worker plumbing (forkserver start: the dataset is pickled to
# each worker ONCE at pool creation via the initializer; batches come back
# pickled once.  forkserver, not fork: the parent has live jax/XLA threads by
# train time and Py3.12 fork-after-threads can deadlock) ----
_WORKER_DATASET = None


def _proc_init(dataset):
    import os

    # Workers do HOST work only (numpy batch assembly); any jax op they
    # incidentally reach (e.g. ops.box_ops helpers) must init the CPU
    # backend, never the device: the parent owns the TPU, and a worker
    # inheriting JAX_PLATFORMS=<tpu-ish> would either fight the parent for
    # the chip or hang on an unreachable runtime (observed: forkserver
    # children inheriting the axon relay env hang the whole loader when the
    # relay dies).  Must run before the worker's first jax op.
    os.environ["JAX_PLATFORMS"] = "cpu"
    # env alone is not enough under the axon sitecustomize (it pins the
    # platform via jax.config at interpreter start); harden the config too.
    # NOTE this still runs AFTER the worker unpickles its payload, so package
    # modules must never run a jax op at import time (see ops/hungarian.py
    # _INF and test_import_initializes_no_jax_backend).
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _build_batch(dataset, idxs, batch_size, pad_last, task_seed):
    if task_seed is not None and hasattr(dataset, "rng"):
        # per-task generator on a SHALLOW COPY: thread workers share the
        # dataset object, so mutating dataset.rng in place would race
        dataset = copy.copy(dataset)
        dataset.rng = np.random.default_rng(task_seed)
    samples = [dataset[i] for i in idxs]
    n_valid = len(samples)
    if pad_last and n_valid < batch_size:
        samples = samples + [samples[-1]] * (batch_size - n_valid)
    batch = collate(samples)
    if pad_last:
        mask = np.zeros(len(samples), np.bool_)
        mask[:n_valid] = True
        batch["pad_mask"] = mask
    return batch


def _proc_build_batch(args):
    idxs, batch_size, pad_last, task_seed = args
    return _build_batch(_WORKER_DATASET, idxs, batch_size, pad_last, task_seed)


class Loader:
    def __init__(self, dataset, batch_size, shuffle=False, seed=0, drop_last=True,
                 num_workers=4, pad_last=False, use_processes=False, prefetch=None):
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
        self.use_processes = use_processes and num_workers > 1
        self.prefetch = prefetch if prefetch is not None else max(2 * num_workers, 2)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        epoch = self.epoch
        self.epoch += 1
        end = n - (n % self.batch_size) if self.drop_last else n
        out = []
        for bi, start in enumerate(range(0, end, self.batch_size)):
            task_seed = (self.seed * 1_000_003 + epoch * 131_071 + bi) & 0x7FFFFFFF
            out.append((order[start : start + self.batch_size], task_seed))
        return out

    def __iter__(self) -> Iterator[dict]:
        tasks = self._index_batches()
        if self.use_processes:
            yield from self._iter_processes(tasks)
        elif self.num_workers > 1:
            yield from self._iter_threads(tasks)
        else:
            for idxs, task_seed in tasks:
                yield _build_batch(
                    self.dataset, idxs, self.batch_size, self.pad_last, task_seed
                )

    def _iter_threads(self, tasks):
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures = []
            for idxs, task_seed in tasks:
                futures.append(
                    pool.submit(
                        _build_batch, self.dataset, idxs, self.batch_size,
                        self.pad_last, task_seed,
                    )
                )
                while len(futures) > self.prefetch:
                    yield futures.pop(0).result()
            for f in futures:
                yield f.result()

    def _iter_processes(self, tasks):
        try:
            ctx = mp.get_context("forkserver")
            # NEVER preload __main__ (the stdlib default): if the launching
            # script initialized jax at module top level, the preload would
            # replay that init INSIDE the forkserver, and every worker would
            # then be forked from a thread/lock-poisoned image -- the exact
            # fork-after-threads deadlock forkserver exists to avoid
            # (observed: racy wedge with 0..N workers spawned, parent parked
            # in Pool startup).  No worker payload needs __main__: tasks are
            # plain tuples and the callables live in this importable module.
            ctx.set_forkserver_preload([])  # no-op if the server is already up
        except ValueError:  # platform without forkserver
            yield from self._iter_threads(tasks)
            return
        args = [
            (idxs, self.batch_size, self.pad_last, task_seed)
            for idxs, task_seed in tasks
        ]
        from collections import deque

        try:
            pool_cm = ctx.Pool(self.num_workers, initializer=_proc_init,
                               initargs=(self.dataset,))
        except Exception:
            # dataset not picklable to the forkserver: degrade to threads
            # (parallelism for the GIL-releasing numpy/cv2 ops is preserved)
            yield from self._iter_threads(tasks)
            return
        with pool_cm as pool:
            # bounded pipeline: at most `prefetch` batches in flight so a
            # slow consumer (e.g. the first train-step compile) cannot pile
            # up finished batches in host RAM (Pool.imap has no backpressure)
            pending = deque()
            for a_ in args:
                pending.append(pool.apply_async(_proc_build_batch, (a_,)))
                while len(pending) >= self.prefetch:
                    yield pending.popleft().get()
            while pending:
                yield pending.popleft().get()


def make_loader(dataset, batch_size, shuffle=False, seed=0, drop_last=True,
                num_workers=4, pad_last=False, use_processes=False, prefetch=None):
    return Loader(dataset, batch_size, shuffle, seed, drop_last, num_workers,
                  pad_last=pad_last, use_processes=use_processes, prefetch=prefetch)
