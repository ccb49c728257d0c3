"""Augmentation queue driven by AUG_CONFIG_LIST.

Parity: ``pcdet/datasets/augmentor/data_augmentor.py`` — gt_sampling,
random_world_flip / rotation / scaling; heading normalized to [-pi, pi) and
calib/plane stripped at the end (``:283-289``).
"""
from __future__ import annotations

from functools import partial

import numpy as np

from . import augmentor_utils
from .database_sampler import DataBaseSampler


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        aug_config_list = augmentor_configs if isinstance(augmentor_configs, list) \
            else augmentor_configs.AUG_CONFIG_LIST
        for cur_cfg in aug_config_list:
            if not isinstance(augmentor_configs, list):
                if cur_cfg.NAME in augmentor_configs.DISABLE_AUG_LIST:
                    continue
            cur_augmentor = getattr(self, cur_cfg.NAME)(config=cur_cfg)
            self.data_augmentor_queue.append(cur_augmentor)

    def gt_sampling(self, config=None):
        return DataBaseSampler(
            root_path=self.root_path, sampler_cfg=config,
            class_names=self.class_names, logger=self.logger)

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        gt_boxes, points = data_dict['gt_boxes'], data_dict['points']
        enable_prob = config.get('ENABLE_PROB', 0.5)
        for cur_axis in config.ALONG_AXIS_LIST:
            assert cur_axis in ['x', 'y']
            gt_boxes, points = getattr(
                augmentor_utils, f'random_flip_along_{cur_axis}')(
                gt_boxes, points, enable_prob=enable_prob)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config.WORLD_ROT_ANGLE
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points = augmentor_utils.global_rotation(
            data_dict['gt_boxes'], data_dict['points'], rot_range=rot_range,
            enable_prob=config.get('ENABLE_PROB', 1.0))
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        gt_boxes, points = augmentor_utils.global_scaling(
            data_dict['gt_boxes'], data_dict['points'],
            config.WORLD_SCALE_RANGE,
            enable_prob=config.get('ENABLE_PROB', 1.0))
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_translation, config=config)
        # the reference handler reads NOISE_TRANSLATE_STD only, yet its
        # pointpillar_newaugs.yaml supplies WORLD_TRANSLATION_RANGE — a
        # latent KeyError in the reference (data_augmentor.py:145). Resolve
        # by accepting either: a range falls back to std = max |bound|.
        std = config.get('NOISE_TRANSLATE_STD', None)
        if std is None:
            rng_cfg = config.get('WORLD_TRANSLATION_RANGE', [0.0, 0.0])
            std = float(np.max(np.abs(rng_cfg)))
        std = float(std)
        if std == 0:
            return data_dict
        gt_boxes, points = augmentor_utils.random_world_translation(
            data_dict['gt_boxes'], data_dict['points'], std,
            along=config.get('ALONG_AXIS_LIST', ['x', 'y', 'z']))
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_local_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_translation, config=config)
        gt_boxes, points = augmentor_utils.random_local_translation(
            data_dict['gt_boxes'], data_dict['points'],
            config.LOCAL_TRANSLATION_RANGE,
            along=config.get('ALONG_AXIS_LIST', ['x', 'y', 'z']))
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_local_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_rotation, config=config)
        rot_range = config.LOCAL_ROT_ANGLE
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points = augmentor_utils.random_local_rotation(
            data_dict['gt_boxes'], data_dict['points'], rot_range)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_local_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_scaling, config=config)
        gt_boxes, points = augmentor_utils.random_local_scaling(
            data_dict['gt_boxes'], data_dict['points'],
            config.LOCAL_SCALE_RANGE)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_image_flip(self, data_dict=None, config=None):
        """CaDDN camera flip (``data_augmentor.py:123-140``)."""
        if data_dict is None:
            return partial(self.random_image_flip, config=config)
        for axis in config.get('ALONG_AXIS_LIST', ['horizontal']):
            assert axis == 'horizontal'
            img, depth, boxes = augmentor_utils.random_image_flip_horizontal(
                data_dict['images'], data_dict['depth_maps'],
                data_dict['gt_boxes'], data_dict['calib'])
        data_dict['images'] = img
        data_dict['depth_maps'] = depth
        data_dict['gt_boxes'] = boxes
        return data_dict

    def random_local_pyramid_aug(self, data_dict=None, config=None):
        """SE-SSD frustum dropout/sparsify/swap
        (``data_augmentor.py:246-267``)."""
        if data_dict is None:
            return partial(self.random_local_pyramid_aug, config=config)
        from . import pyramid_augs
        gt_boxes, points = pyramid_augs.random_local_pyramid_aug(
            data_dict['gt_boxes'], data_dict['points'],
            config.DROP_PROB, config.SPARSIFY_PROB, config.SPARSIFY_MAX_NUM,
            config.SWAP_PROB, config.SWAP_MAX_NUM)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_local_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_frustum_dropout, config=config)
        gt_boxes, points = data_dict['gt_boxes'], data_dict['points']
        for direction in config.get('DIRECTION', ['top']):
            assert direction in ('top', 'bottom', 'left', 'right')
            gt_boxes, points = augmentor_utils.local_frustum_dropout(
                gt_boxes, points, config.INTENSITY_RANGE, direction=direction)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def random_world_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_frustum_dropout, config=config)
        intensity_range = config.INTENSITY_RANGE
        for direction in config.get('DIRECTION', ['top']):
            gt_boxes, points = augmentor_utils.global_frustum_dropout(
                data_dict['gt_boxes'], data_dict['points'], intensity_range,
                direction=direction)
            data_dict['gt_boxes'] = gt_boxes
            data_dict['points'] = points
        return data_dict

    def forward(self, data_dict):
        for cur_augmentor in self.data_augmentor_queue:
            data_dict = cur_augmentor(data_dict=data_dict)
        # normalize heading to [-pi, pi) (``data_augmentor.py:283-289``)
        gt = data_dict['gt_boxes']
        gt[:, 6] = gt[:, 6] - np.floor(gt[:, 6] / (2 * np.pi) + 0.5) * 2 * np.pi
        data_dict.pop('calib', None)
        data_dict.pop('road_plane', None)
        return data_dict
