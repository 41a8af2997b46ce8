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


def _shm_worker(ds_bytes, schema, shm_names, task_q, done_q, seed,
                max_voxels, max_points, ignore_label, on_overflow="warn"):
    """Shared-memory loader worker (spawned process).

    Builds collated batches and writes the array fields straight into the
    assigned shm slot — the zero-pickle transport that makes process
    workers actually pay off (25 MB batches through a result pipe cost more
    than building them). Non-array fields (metadata, scalars) travel on the
    tiny done queue. This is the torch-DataLoader shared-memory design
    rebuilt for the numpy pipeline (reference build_loader.py:24)."""
    import pickle
    from multiprocessing import shared_memory

    dataset = pickle.loads(ds_bytes)
    shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
    views = []
    for shm in shms:
        view, off = {}, 0
        for key, (shape, dtype) in schema.items():
            nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
            view[key] = np.ndarray(shape, dtype, buffer=shm.buf[off:off + nbytes])
            off += nbytes
        views.append(view)
    while True:
        task = task_q.get()
        if task is None:
            return
        slot, step, epoch, batch_idx = task
        try:
            batch = _process_make_batch(
                dataset, batch_idx, epoch, step, seed, max_voxels,
                max_points, ignore_label, on_overflow)
            extras = {}
            for key, val in batch.items():
                if key in schema:
                    views[slot][key][...] = val
                else:
                    extras[key] = val
            done_q.put((step, slot, extras, None))
        except Exception as e:  # surface worker crashes to the main process
            done_q.put((step, slot, None, repr(e)))


def _process_make_batch(dataset, batch_idx, epoch, step, seed, max_voxels,
                        max_points, ignore_label, on_overflow="warn"):
    """Top-level (picklable) batch builder for process workers."""
    frames = []
    for j, i in enumerate(batch_idx):
        rng = np.random.default_rng(
            (seed * 1_000_003 + epoch) * 1_000_003 + step * 64 + j
        )
        fr = dataset.get_sensor_data(int(i), rng=rng)
        if isinstance(fr, list):
            frames.extend(fr)
        else:
            frames.append(fr)
    return collate_segnet(frames, max_voxels, max_points, ignore_label,
                          on_overflow)


class EpochSampler:
    """Deterministic per-epoch shuffling with per-host sharding.

    ``flags`` (optional, [n] ints) makes it group-aware like the
    reference's DistributedGroupSampler (det3d/datasets/loader/
    sampler.py:139): every per-host batch is drawn from a SINGLE group —
    each group's (shuffled) indices are padded to whole batches, the
    batch list is shuffled globally, and batches are dealt round-robin to
    hosts. Only consulted when shuffling (training); eval keeps dataset
    order."""

    def __init__(self, n, batch_size, shuffle=True, seed=0, num_hosts=1,
                 host_id=0, drop_last=True, flags=None):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.flags = None
        if flags is not None:
            flags = np.asarray(flags)
            if len(np.unique(flags)) > 1:
                self.flags = flags

    def _grouped_epoch_indices(self, epoch):
        rng = np.random.default_rng(self.seed + epoch)
        chunks = []
        for g in np.unique(self.flags):
            idx = rng.permutation(np.flatnonzero(self.flags == g))
            nb = -(-len(idx) // self.batch_size)
            idx = np.resize(idx, nb * self.batch_size)  # wrap-pad the tail
            chunks.extend(idx.reshape(-1, self.batch_size))
        order = rng.permutation(len(chunks))
        chunks = [chunks[i] for i in order]
        # equal per-host batch counts (repeat leading batches if needed)
        nb_host = -(-len(chunks) // self.num_hosts)
        while len(chunks) < nb_host * self.num_hosts:
            chunks.append(chunks[len(chunks) % max(1, len(chunks))])
        mine = chunks[self.host_id::self.num_hosts]
        return np.stack(mine)

    def epoch_indices(self, epoch):
        if self.shuffle and self.flags is not None:
            return self._grouped_epoch_indices(epoch)
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
        if self.shuffle and self.flags is not None:
            nb = sum(
                -(-int(np.sum(self.flags == g)) // self.batch_size)
                for g in np.unique(self.flags)
            )
            return -(-nb // self.num_hosts)
        per_host = -(-self.n // self.num_hosts)
        if self.drop_last:
            return per_host // self.batch_size
        return -(-per_host // self.batch_size)


class SegDataLoader:
    """Prefetching loader producing padded numpy batches."""

    def __init__(self, dataset, batch_size, max_voxels, max_points,
                 shuffle=True, seed=0, num_hosts=1, host_id=0,
                 num_workers=4, prefetch=4, drop_last=True, ignore_label=0,
                 worker_mode="thread", on_overflow="warn"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_voxels = max_voxels
        self.max_points = max_points
        self.sampler = EpochSampler(
            len(dataset), batch_size, shuffle, seed, num_hosts, host_id,
            drop_last, flags=getattr(dataset, "flag", None),
        )
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.ignore_label = ignore_label
        self.on_overflow = on_overflow
        self.seed = seed
        # "thread": cheap, but the python pipeline holds the GIL, capping
        #   throughput near single-core (~14 scans/s at KITTI scale; MORE
        #   than one thread measures net-SLOWER — GIL thrash)
        # "process": spawned ProcessPoolExecutor; results pickle through a
        #   pipe (~25 MB/batch), which caps scaling
        # "shm": spawned workers writing batches into a shared-memory slot
        #   ring — the torch-DataLoader-equivalent production mode.
        # NOTE: on a single-core host (like the 1-vCPU dev box this repo is
        # benchmarked on) one thread IS the ceiling (~14 scans/s at KITTI
        # scale after the voxelizer fast path); worker modes only pay off
        # with real cores.
        self.worker_mode = worker_mode
        self._pool = None
        self._shm_procs = None

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
            frames, self.max_voxels, self.max_points, self.ignore_label,
            self.on_overflow,
        )

    def _start_shm_workers(self, schema):
        """Spawn persistent shm-ring workers (worker_mode='shm')."""
        import pickle
        import multiprocessing as mp
        from multiprocessing import shared_memory

        ctx = mp.get_context("spawn")
        n_slots = max(self.prefetch, self.num_workers) + 2
        total = sum(
            int(np.prod(shape)) * np.dtype(dtype).itemsize
            for shape, dtype in schema.values()
        )
        self._shm_blocks = [
            shared_memory.SharedMemory(create=True, size=total)
            for _ in range(n_slots)
        ]
        self._shm_views = []
        for shm in self._shm_blocks:
            view, off = {}, 0
            for key, (shape, dtype) in schema.items():
                nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
                view[key] = np.ndarray(
                    shape, dtype, buffer=shm.buf[off:off + nbytes])
                off += nbytes
            self._shm_views.append(view)
        self._task_q = ctx.Queue()
        self._done_q = ctx.Queue()
        ds_bytes = pickle.dumps(self.dataset)
        names = [s.name for s in self._shm_blocks]
        self._shm_procs = [
            ctx.Process(
                target=_shm_worker,
                args=(ds_bytes, schema, names, self._task_q, self._done_q,
                      self.seed, self.max_voxels, self.max_points,
                      self.ignore_label, self.on_overflow),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in self._shm_procs:
            p.start()
        self._shm_slots = n_slots
        self._shm_schema = schema
        import atexit

        atexit.register(self.shutdown)

    def shutdown(self):
        """Stop shm workers and unlink the shared-memory blocks."""
        if getattr(self, "_shm_procs", None):
            for _ in self._shm_procs:
                try:
                    self._task_q.put(None)
                except Exception:
                    pass
            for p in self._shm_procs:
                p.join(timeout=2)
                if p.is_alive():
                    p.terminate()
            self._shm_procs = None
        for shm in getattr(self, "_shm_blocks", None) or []:
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass
        self._shm_blocks = None

    def _epoch_shm(self, epoch, batches):
        """Yield the epoch through the shm ring, preserving batch order."""
        if getattr(self, "_shm_procs", None) is None:
            # schema from one batch built in-process (shapes are static)
            probe = self._make_batch(batches[0], epoch, 0)
            schema = {
                k: (v.shape, v.dtype) for k, v in probe.items()
                if isinstance(v, np.ndarray)
            }
            self._start_shm_workers(schema)
        free = list(range(self._shm_slots))
        pending = {}  # step -> (extras or Exception)
        nxt_submit = 0
        schema = self._shm_schema

        def submit():
            nonlocal nxt_submit
            while free and nxt_submit < len(batches):
                self._task_q.put(
                    (free.pop(), nxt_submit, epoch, list(batches[nxt_submit])))
                nxt_submit += 1

        submit()
        for step in range(len(batches)):
            while step not in pending:
                done_step, slot, extras, err = self._done_q.get(timeout=600)
                if err is not None:
                    raise RuntimeError(f"loader worker failed: {err}")
                # copy out of the slot, then recycle it immediately
                batch = {k: np.array(self._shm_views[slot][k])
                         for k in schema}
                batch.update(extras)
                pending[done_step] = batch
                free.append(slot)
                submit()
            yield pending.pop(step)

    def _get_pool(self):
        if self._pool is not None:
            return self._pool
        if self.worker_mode == "process":
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn: never fork a process that may hold TPU runtime threads
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def _submit(self, pool, bidx, epoch, step):
        if self.worker_mode == "process":
            return pool.submit(
                _process_make_batch, self.dataset, bidx, epoch, step,
                self.seed, self.max_voxels, self.max_points,
                self.ignore_label, self.on_overflow,
            )
        return pool.submit(self._make_batch, bidx, epoch, step)

    def epoch(self, epoch):
        """Yield batches for one epoch, prepared by a persistent worker pool
        (threads, spawned processes, or the shared-memory ring;
        SURVEY.md §7.3 item 6: the host pipeline must keep the TPU fed)."""
        batches = self.sampler.epoch_indices(epoch)
        if (self.worker_mode == "shm" and self.num_workers > 1
                and len(batches) > 0):
            yield from self._epoch_shm(epoch, batches)
            return
        pool = self._get_pool()
        window = max(self.prefetch, self.num_workers)
        futures = [
            self._submit(pool, bidx, epoch, step)
            for step, bidx in enumerate(batches[:window])
        ]
        nxt = len(futures)
        for i in range(len(batches)):
            batch = futures[i].result()
            futures[i] = None  # drop the ~25 MB result reference NOW:
            # retaining every future leaks the whole epoch's batches
            if nxt < len(batches):
                futures.append(self._submit(pool, batches[nxt], epoch, nxt))
                nxt += 1
            yield batch
