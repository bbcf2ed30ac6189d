"""Host-side data loading: prefetching iterator over scene datasets.

Replaces the reference's torchdata StatefulDataLoader workers
(`cli/train.py:546-558`) with a thread-pool prefetcher (numpy pipelines
release the GIL in the hot paths — image decode, blur, resize). The
iterator is *stateful*: its position (epoch, cursor, RNG) can be saved and
restored with checkpoints, mirroring the reference's dataloader
statefulness (`cli/train.py:52,546`).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from mvtracker_tpu.datasets.datapoint import Datapoint, collate


class PrefetchLoader:
    """Prefetching, shuffling, stateful batch loader.

    `dataset` is any indexable returning a Datapoint; `batch_size` scenes
    are collated into the train-step batch dict.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0
        self.cursor = 0
        self._executor = None
        # Multi-host DP: each process must feed DIFFERENT scenes (its own
        # slice of the global batch; see `parallel.mesh.shard_batch_pytree`).
        # Every process iterates the SAME seeded permutation and takes a
        # disjoint stride of it, so the global epoch is a partition — the
        # multi-host analogue of torch's DistributedSampler. The CLI wires
        # jax.process_index()/process_count() in; None means single-host.
        self.process_index = process_index
        self.process_count = process_count

    # -- statefulness --------------------------------------------------
    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "cursor": self.cursor, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self.epoch = state["epoch"]
        self.cursor = state["cursor"]
        self.seed = state["seed"]

    # -- iteration -----------------------------------------------------
    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = (
            np.arange(n)
            if not self.shuffle
            else np.random.default_rng(self.seed + epoch).permutation(n)
        )
        pc = self.process_count
        if pc is None and self.process_index is not None:
            raise ValueError("process_index given without process_count")
        if pc is None:
            return order
        pi = self.process_index or 0
        # Disjoint stride of the shared permutation per process.
        return order[pi::pc]

    def __iter__(self) -> Iterator[dict]:
        while True:
            order = self._order(self.epoch)
            n = len(order)
            while self.cursor + self.batch_size <= n or (
                not self.drop_last and self.cursor < n
            ):
                idxs = order[self.cursor : self.cursor + self.batch_size]
                self.cursor += len(idxs)
                yield self._load_batch(idxs)
            self.epoch += 1
            self.cursor = 0

    def _load_batch(self, idxs) -> dict:
        if self.num_workers <= 1 or len(idxs) == 1:
            dps = [self.dataset[int(i)] for i in idxs]
        else:
            if self._executor is None:
                from concurrent.futures import ThreadPoolExecutor

                self._executor = ThreadPoolExecutor(max_workers=self.num_workers)
            dps = list(self._executor.map(lambda i: self.dataset[int(i)], idxs))
        return collate(dps)

    def prefetching_iter(self) -> Iterator[dict]:
        """Background-thread prefetch of `prefetch` batches ahead."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_interruptible(item) -> bool:
            """put() that re-checks `stop` — a plain blocking put deadlocks
            the producer forever when the consumer abandons the iterator
            with the queue full (leaking the thread + pinned batches)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self:
                    if not put_interruptible(batch):
                        return
            finally:
                put_interruptible(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class SyntheticSceneDataset:
    """Indexable dataset of procedurally generated scenes (seeded per index).

    Stands in for the Kubric training set in hermetic environments; the
    per-index seeding mirrors the reference's per-sample seeded RNG
    (`kubric_multiview_dataset.py:475-484`).
    """

    def __init__(
        self,
        n_scenes: int = 64,
        seed: int = 0,
        cache: bool = False,
        randomize: bool = False,
        augment: bool = False,
        disk_cache_dir: str | None = None,
        **render_kwargs,
    ):
        self.n_scenes = n_scenes
        self.seed = seed
        self.randomize = randomize
        self.augment = augment
        self.render_kwargs = render_kwargs
        self._cache: dict[int, Datapoint] = {} if cache else None
        # Disk-backed render cache: a supervised on-chip run restarts after
        # hangs (scripts/run_supervised_train.sh) and the in-memory cache
        # dies with each worker process — at res 128 re-rendering 512
        # scenes costs ~15 data-bound minutes per restart. Scenes are keyed
        # by their seed; renderer-parameter changes need a fresh dir.
        self._disk_dir = disk_cache_dir
        if disk_cache_dir:
            os.makedirs(disk_cache_dir, exist_ok=True)

    def __len__(self):
        return self.n_scenes

    def _disk_path(self, scene_seed: int) -> str:
        return os.path.join(self._disk_dir, f"scene_{scene_seed}.npz")

    def _disk_load(self, scene_seed: int) -> Optional[Datapoint]:
        path = self._disk_path(scene_seed)
        if not os.path.exists(path):
            return None
        try:
            z = np.load(path, allow_pickle=False)
            return Datapoint(
                **{k: z[k] for k in z.files if k != "seq_name"},
                seq_name=f"synthetic_{scene_seed}",
            )
        except Exception:  # truncated write from a killed worker: re-render
            return None

    def _disk_save(self, scene_seed: int, dp: Datapoint):
        import dataclasses as _dc

        arrays = {
            f.name: getattr(dp, f.name)
            for f in _dc.fields(dp)
            if isinstance(getattr(dp, f.name), np.ndarray)
        }
        # np.savez appends ".npz" to names without the suffix; keep it so
        # the temp path is exactly what savez writes.
        tmp = self._disk_path(scene_seed) + f".tmp{os.getpid()}.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, self._disk_path(scene_seed))  # atomic vs readers

    def __getitem__(self, idx: int) -> Datapoint:
        scene_seed = self.seed * 100_003 + idx
        if self._cache is not None and idx in self._cache:
            dp = self._cache[idx]
        else:
            dp = self._disk_load(scene_seed) if self._disk_dir else None
            if dp is None:
                from mvtracker_tpu.datasets.synthetic import render_scene

                kwargs = dict(self.render_kwargs)
                if self.randomize:
                    srng = np.random.default_rng(scene_seed + 17)
                    kwargs.setdefault("n_objects", int(srng.integers(3, 9)))
                    kwargs.setdefault("static_fraction", float(srng.uniform(0.0, 0.5)))
                    kwargs.setdefault("cam_radius", float(srng.uniform(3.0, 5.0)))
                dp = render_scene(seed=scene_seed, **kwargs)
                if self._disk_dir:
                    self._disk_save(scene_seed, dp)
            if self._cache is not None:
                self._cache[idx] = dp
        if self.augment:
            from mvtracker_tpu.datasets.augmentations import default_train_augmentations

            # Fresh aug RNG each epoch-touch (non-deterministic across epochs,
            # like the reference's unseeded train-time augs).
            dp = default_train_augmentations(dp, np.random.default_rng())
        return dp


class MonocularProxyDataset:
    """Adapts any multi-view dataset into monocular 2D-tracking problems
    for training `models.cotracker2d.CoTracker2D`.

    Per scene: keep one view's video, replace the 3D world trajectory with
    that view's pixel-space track (x, y, 0) and the query with its first
    view-visible pixel position. Depth is zeroed (the 2D tracker ignores
    it); the Datapoint contract and the whole Trainer/loss stack apply
    unchanged — z is supervised to 0.
    """

    def __init__(self, base, view: int | None = None):
        self.base = base
        self.view = view  # None: rotate through views by index

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx: int) -> Datapoint:
        dp = self.base[idx]
        v = dp.video.shape[0]
        vi = self.view if self.view is not None else idx % v
        traj2d = dp.trajectory[vi]  # [T, N, 3] (x, y, z_cam)
        t, n = traj2d.shape[:2]
        traj = np.concatenate(
            [traj2d[..., :2], np.zeros((t, n, 1), np.float32)], axis=-1
        )
        visibility = dp.visibility[vi : vi + 1]  # [1, T, N]
        vis_any = visibility[0]
        has = vis_any.any(axis=0)
        first = np.argmax(vis_any, axis=0)
        first[~has] = 0
        query = np.concatenate(
            [first[:, None].astype(np.float32), traj[first, np.arange(n)]], axis=1
        )
        return Datapoint(
            video=dp.video[vi : vi + 1],
            videodepth=np.zeros_like(dp.videodepth[vi : vi + 1]),
            intrs=dp.intrs[vi : vi + 1],
            extrs=dp.extrs[vi : vi + 1],
            trajectory=np.concatenate(
                [traj2d[..., :2], np.zeros((t, n, 1), np.float32)], axis=-1
            )[None],
            visibility=visibility,
            trajectory_3d=traj,
            query_points_3d=query,
            valid=np.ones((t, n), bool),
            seq_name=f"{dp.seq_name}_view{vi}_2d",
        )


def compress_batch_for_transfer(batch: dict) -> dict:
    """Shrink the per-step host->device payload (tunneled chips especially).

    rgbs (0..255 float) -> uint8 and depths -> float16: 12.6 MB -> ~4 MB
    per flagship res-128 scene, i.e. ~3x less link time per step. The train
    step casts back to f32 on-device (`training/step.py::scene_loss`).
    uint8 rounding loses <0.5/255 of photometric precision (the reference
    trains from uint8 sources anyway); float16 depth carries ~0.05%
    relative error — ~2 mm at the synthetic domain's 3.5-unit working
    distance, far under the 1-px geometric footprint.
    """
    out = dict(batch)
    if "rgbs" in out and out["rgbs"].dtype != np.uint8:
        out["rgbs"] = np.clip(np.rint(out["rgbs"]), 0, 255).astype(np.uint8)
    if "depths" in out and out["depths"].dtype == np.float32:
        out["depths"] = out["depths"].astype(np.float16)
    return out
