"""Data loading: per-process sharded iteration + background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` +
``DistributedSampler`` (``pcdet/datasets/__init__.py:44-73``) with a
host-local design for SPMD: each JAX process loads its own shard of the
global batch (epoch-seeded shuffle, same semantics as
``DistributedSampler(shuffle=True)``), a thread pool runs the numpy
pipeline, and a background thread keeps a small queue of ready batches so
the TPU never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .dataset import DEFAULT_MAX_GT, collate_batch


class ShardedSampler:
    """Epoch-seeded shuffled index sharding (parity: DistributedSampler)."""

    def __init__(self, dataset_len, num_shards=1, shard_id=0, shuffle=True,
                 drop_last=True, seed=0):
        self.dataset_len = dataset_len
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def indices(self):
        idx = np.arange(self.dataset_len)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.drop_last:
            per = self.dataset_len // self.num_shards
            idx = idx[:per * self.num_shards]
        else:
            pad = (-len(idx)) % self.num_shards
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.shard_id::self.num_shards]


class DataLoader:
    """Minimal prefetching loader over a DatasetTemplate."""

    def __init__(self, dataset, batch_size, sampler=None, num_workers=4,
                 prefetch=4, collate_fn=None, drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(len(dataset),
                                                 shuffle=dataset.training,
                                                 drop_last=drop_last)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        max_gt = getattr(dataset, 'max_gt', None)
        # fixed-shape cap for ragged voxel-family point clouds (jit shape
        # stability across batches); see collate_batch's padding contract
        max_points = None
        ds_cfg = getattr(dataset, 'dataset_cfg', None)
        if ds_cfg is not None:
            max_points = ds_cfg.get('MAX_POINTS_PER_FRAME', None)
        if collate_fn is None:
            def collate_fn(items, _mg=max_gt, _mp=max_points):
                return collate_batch(items, max_gt=_mg or DEFAULT_MAX_GT,
                                     max_points=_mp)
        self.collate_fn = collate_fn

    def __len__(self):
        n = len(self.sampler.indices())
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        indices = self.sampler.indices()
        n_batches = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]
        if not self.drop_last and batches and \
                len(batches[-1]) < self.batch_size:
            # pad the final eval batch to full size so it divides across the
            # device mesh; duplicates are dropped downstream by frame_id
            # (Trainer.evaluate dedup)
            last = batches[-1]
            pad = self.batch_size - len(last)
            batches[-1] = np.concatenate([last, np.repeat(last[-1:], pad)])
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(self.collate_fn(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, logger=None, training=True,
                     seed=0, num_shards=1, shard_id=0, total_epochs=0):
    """Registry + loader construction (parity: ``datasets/__init__.py:44-73``)."""
    from .kitti.kitti_dataset import KittiDataset
    from .nuscenes.nuscenes_dataset import NuScenesDataset
    from .waymo.waymo_dataset import WaymoDataset
    registry = {'KittiDataset': KittiDataset,
                'NuScenesDataset': NuScenesDataset,
                'WaymoDataset': WaymoDataset}
    dataset_cls = registry[dataset_cfg.DATASET]
    dataset = dataset_cls(dataset_cfg=dataset_cfg, class_names=class_names,
                          root_path=root_path, training=training, logger=logger)
    sampler = ShardedSampler(len(dataset), num_shards=num_shards,
                             shard_id=shard_id, shuffle=training,
                             drop_last=training, seed=seed)
    loader = DataLoader(dataset, batch_size, sampler=sampler,
                        num_workers=workers, drop_last=training)
    return dataset, loader, sampler
