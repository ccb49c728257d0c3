"""Point feature selection (parity: ``processor/point_feature_encoder.py``)."""
from __future__ import annotations

import numpy as np


class PointFeatureEncoder:
    def __init__(self, config, point_cloud_range=None):
        self.point_encoding_config = config
        assert list(config.src_feature_list[0:3]) == ['x', 'y', 'z']
        self.used_feature_list = list(config.used_feature_list)
        self.src_feature_list = list(config.src_feature_list)
        self.point_cloud_range = point_cloud_range

    @property
    def num_point_features(self):
        return getattr(self, self.point_encoding_config.encoding_type)(points=None)

    def forward(self, data_dict):
        data_dict['points'], use_lead_xyz = getattr(
            self, self.point_encoding_config.encoding_type)(data_dict['points'])
        data_dict['use_lead_xyz'] = use_lead_xyz
        if self.point_encoding_config.get('filter_sweeps', False) and \
                'timestamp' in self.src_feature_list:
            # keep only the max_sweeps most-recent sweep timestamps
            # (reference ``point_feature_encoder.py:34-39``; unused by
            # shipped configs but part of the config surface)
            max_sweeps = self.point_encoding_config.max_sweeps
            idx = self.src_feature_list.index('timestamp')
            dt = np.round(data_dict['points'][:, idx], 2)
            uniq = sorted(np.unique(dt))
            max_dt = uniq[min(len(uniq) - 1, max_sweeps - 1)]
            data_dict['points'] = data_dict['points'][dt <= max_dt]
        return data_dict

    def absolute_coordinates_encoding(self, points=None):
        if points is None:
            return len(self.used_feature_list)
        point_feature_list = [points[:, 0:3]]
        for x in self.used_feature_list:
            if x in ('x', 'y', 'z'):
                continue
            idx = self.src_feature_list.index(x)
            point_feature_list.append(points[:, idx:idx + 1])
        return np.concatenate(point_feature_list, axis=1), True
