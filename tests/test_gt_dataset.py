"""KittiGtDataset (GT-crop stability training data) on a synthetic dbinfos
tree: K-fold exactness, occlusion aug, canonical normalization."""
import pickle

import numpy as np
import pytest

from spsnet_tpu.stability.gt_dataset import (KittiGtDataset, kfold_split,
                                             scan_to_rv)
from spsnet_tpu.config import EDict


@pytest.fixture(scope='module')
def db_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti_db')
    (root / 'gt_database').mkdir()
    rng = np.random.default_rng(0)
    infos = {'Car': [], 'Van': []}
    for i in range(24):
        n = int(rng.integers(40, 400))
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(-2, 2, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        pts[:, 2] = rng.uniform(-0.8, 0.8, n)
        rel = f'gt_database/car_{i}.bin'
        pts.tofile(str(root / rel))
        infos['Car'].append({
            'path': rel, 'image_idx': f'{i:06d}', 'gt_idx': i,
            'num_points_in_gt': n,
            'box3d_lidar': np.array(
                [rng.uniform(5, 40), rng.uniform(-10, 10), -1.0,
                 3.9, 1.6, 1.56, rng.uniform(-np.pi, np.pi)], np.float32)})
    with open(root / 'kitti_dbinfos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_kfold_matches_sklearn_semantics():
    folds = kfold_split(25, n_splits=10, seed=42)
    assert len(folds) == 10
    sizes = [len(v) for _, v in folds]
    assert sorted(sizes, reverse=True) == sizes  # leading folds larger
    assert sum(sizes) == 25
    all_val = np.concatenate([v for _, v in folds])
    assert len(np.unique(all_val)) == 25         # partition
    tr, va = folds[0]
    assert set(tr) | set(va) == set(range(25))
    assert not (set(tr) & set(va))


def test_getitem_shapes_and_normalization(db_root):
    ds = KittiGtDataset(EDict({'DATA_PATH': str(db_root), 'FOLD_IDX': 0,
                               'OCCLUDE_AUG': False}),
                        training=True, root_path=db_root)
    np.random.seed(0)
    s = ds[0]
    assert s['points'].shape == (512, 4)
    assert s['gt_boxes_input'].shape == (8,)
    assert s['gt_boxes'].shape == (7,)
    # sin^2 + cos^2 of the heading encoding
    assert s['gt_boxes_input'][6] ** 2 + s['gt_boxes_input'][7] ** 2 == \
        pytest.approx(1.0, abs=1e-5)
    # canonicalized crop should be near the origin at anchor scale
    assert np.abs(s['points'][:, :2]).max() < 3.0


def test_fold_split_partitions_dataset(db_root):
    cfg = EDict({'DATA_PATH': str(db_root), 'FOLD_IDX': 1,
                 'OCCLUDE_AUG': False})
    tr = KittiGtDataset(cfg, training=True, root_path=db_root)
    va = KittiGtDataset(cfg, training=False, root_path=db_root)
    assert len(tr) + len(va) == 24
    tr_ids = {i['gt_idx'] for i in tr.infos}
    va_ids = {i['gt_idx'] for i in va.infos}
    assert not (tr_ids & va_ids)


def test_occlude_aug_removes_points(db_root):
    ds = KittiGtDataset(EDict({'DATA_PATH': str(db_root),
                               'FORCE_RATIO': 1.0, 'FORCE_NUM': 20}),
                        training=True, root_path=db_root)
    np.random.seed(3)
    info = max(ds.infos, key=lambda i: i['num_points_in_gt'])
    pts = ds._load_points(info)
    out = ds.occlude_aug(info, pts, max_num=20, min_num=1, max_try_time=50)
    assert len(out) <= max(20, len(pts))   # either capped or gave up intact
    assert len(out) >= 1


def test_scan_to_rv_bounds():
    rng = np.random.default_rng(4)
    scan = np.zeros((100, 4), np.float32)
    scan[:, 0] = rng.uniform(3, 50, 100)
    scan[:, 1] = rng.uniform(-20, 20, 100)
    scan[:, 2] = rng.uniform(-2, 1, 100)
    rv = scan_to_rv(scan)
    assert (rv[:, 0] >= 0).all() and (rv[:, 0] <= 511).all()
    assert (rv[:, 1] >= 0).all() and (rv[:, 1] <= 47).all()
    assert (rv[:, 2] > 0).all()


def test_cvae_trains_on_gt_crops(db_root):
    """End-to-end: GT-crop batch through the stability CVAE loss."""
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.stability.model import GenerateCenter
    from tests.test_stability import tiny_stability_cfg
    ds = KittiGtDataset(EDict({'DATA_PATH': str(db_root),
                               'OCCLUDE_AUG': False}),
                        training=True, root_path=db_root)
    np.random.seed(1)
    batch = ds.collate_batch([ds[i] for i in range(4)])
    model = GenerateCenter(model_cfg=tiny_stability_cfg())
    db = {'points': jnp.asarray(batch['points'])}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'latent': jax.random.PRNGKey(1)}, db, train=True)
    ret, _ = model.apply(variables, db, train=True,
                         mutable=['batch_stats'],
                         rngs={'latent': jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(ret['center_pred'])).all()
