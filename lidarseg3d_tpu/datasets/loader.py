"""Input pipeline: per-host sharded sampling + threaded prefetch + padded
collate.

Replaces the reference's torch DataLoader + DistributedGroupSampler
(det3d/datasets/loader/build_loader.py:24, sampler.py:74-139) with a
host-side pipeline feeding fixed-shape numpy batches: each JAX process
takes a disjoint shard of the epoch (padded to equal per-host counts), and a
small thread pool hides the voxelization/augmentation latency.
"""

import queue
import threading

import numpy as np

from .batching import collate_segnet


class EpochSampler:
    """Deterministic per-epoch shuffling with per-host sharding."""

    def __init__(self, n, batch_size, shuffle=True, seed=0, num_hosts=1,
                 host_id=0, drop_last=True):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last

    def epoch_indices(self, epoch):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            idx = rng.permutation(idx)
        # pad so every host sees the same number of samples
        per_host = -(-len(idx) // self.num_hosts)
        pad = per_host * self.num_hosts - len(idx)
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        idx = idx[self.host_id::self.num_hosts]
        if self.drop_last:
            nb = len(idx) // self.batch_size
            idx = idx[: nb * self.batch_size]
        else:
            nb = -(-len(idx) // self.batch_size)
            idx = np.resize(idx, nb * self.batch_size)  # wraps around if short
        return idx.reshape(-1, self.batch_size)

    def steps_per_epoch(self):
        per_host = -(-self.n // self.num_hosts)
        if self.drop_last:
            return per_host // self.batch_size
        return -(-per_host // self.batch_size)


class SegDataLoader:
    """Prefetching loader producing padded numpy batches."""

    def __init__(self, dataset, batch_size, max_voxels, max_points,
                 shuffle=True, seed=0, num_hosts=1, host_id=0,
                 num_workers=4, prefetch=4, drop_last=True, ignore_label=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_voxels = max_voxels
        self.max_points = max_points
        self.sampler = EpochSampler(
            len(dataset), batch_size, shuffle, seed, num_hosts, host_id,
            drop_last,
        )
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.ignore_label = ignore_label
        self.seed = seed

    def steps_per_epoch(self):
        return self.sampler.steps_per_epoch()

    def _make_batch(self, batch_idx, epoch, step):
        frames = []
        for j, i in enumerate(batch_idx):
            rng = np.random.default_rng(
                (self.seed * 1_000_003 + epoch) * 1_000_003 + step * 64 + j
            )
            fr = self.dataset.get_sensor_data(int(i), rng=rng)
            if isinstance(fr, list):  # TTA variants become separate rows
                frames.extend(fr)
            else:
                frames.append(fr)
        return collate_segnet(
            frames, self.max_voxels, self.max_points, self.ignore_label
        )

    def epoch(self, epoch):
        """Yield batches for one epoch, prepared by a worker pool.

        cv2 / numpy release the GIL for the heavy kernels, so threads give
        real parallelism for the voxelize + image-augmentation pipeline
        (SURVEY.md §7.3 item 6: host pipeline must keep the TPU fed)."""
        from concurrent.futures import ThreadPoolExecutor

        batches = self.sampler.epoch_indices(epoch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            window = max(self.prefetch, self.num_workers)
            futures = [
                pool.submit(self._make_batch, bidx, epoch, step)
                for step, bidx in enumerate(batches[:window])
            ]
            nxt = len(futures)
            for i in range(len(batches)):
                batch = futures[i].result()
                if nxt < len(batches):
                    futures.append(
                        pool.submit(self._make_batch, batches[nxt], epoch, nxt)
                    )
                    nxt += 1
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
