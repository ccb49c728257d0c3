"""DGCNN-style surface feature extraction (SPSNet's DenseEdgeConv stack).

Rebuild of ``pcdet/ops/pointnet2/pointnet2_batch/surface_feature.py``:
4 edge-conv units (channels 24, 3 FC layers each, growth 12, knn 16 via
radius-0.8 ball-query grouping) -> 60-d per-point descriptor.

Deviation (documented): the reference defaults to ``dynamic_graph=True``,
which passes the 24-d feature tensor into the CUDA ball query as if it were
(N, 3) xyz (``surface_feature.py:178-181`` -> ``get_edge_feature``) — a
memory-layout bug producing garbage neighbor sets. We build the graph in
actual xyz space (the reference's own ``static_graph_forward``), which is the
well-defined variant of the same architecture.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .. import ops


class FCLayer(nn.Module):
    out_channels: int
    activation: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_channels)(x)
        if self.activation == 'relu':
            x = nn.relu(x)
        return x


class DenseEdgeConv(nn.Module):
    """Densely-connected edge convolution over ball-query neighborhoods."""
    in_channels: int
    num_fc_layers: int = 3
    growth_rate: int = 12
    radius: float = 0.8
    knn: int = 16
    relative_feat_only: bool = False

    @property
    def out_channels(self):
        return self.in_channels + self.num_fc_layers * self.growth_rate

    @nn.compact
    def __call__(self, x, pos, idx=None):
        """x: (B, N, d) features; pos: (B, N, 3) graph positions; idx:
        optional precomputed (B, N, K) neighbor indices — the static-xyz
        graph is identical for every unit in the stack, and the Pallas d2 /
        approx-top-k custom calls inside ball_query are opaque to XLA CSE,
        so the caller hoists the query (4x -> 1x; ~80 ms/step on the
        SPSNet train step at N=16384)."""
        if idx is None:
            idx = ops.ball_query(self.radius, self.knn, pos, pos)
        knn_feat = ops.group_points(x, idx)               # (B, N, K, d)
        x_tiled = jnp.broadcast_to(x[:, :, None, :], knn_feat.shape)
        if self.relative_feat_only:
            edge_feat = knn_feat - x_tiled
        else:
            edge_feat = jnp.concatenate(
                [x_tiled, knn_feat, knn_feat - x_tiled], axis=-1)

        y = jnp.concatenate([
            FCLayer(self.growth_rate, name='layer_first')(edge_feat),
            jnp.broadcast_to(x[:, :, None, :], knn_feat.shape),
        ], axis=-1)
        for i in range(1, self.num_fc_layers - 1):
            y = jnp.concatenate(
                [FCLayer(self.growth_rate, name=f'layer_{i}')(y), y], axis=-1)
        y = jnp.concatenate(
            [FCLayer(self.growth_rate, activation=None,
                     name='layer_last')(y), y], axis=-1)
        return jnp.max(y, axis=-2)                        # (B, N, d + L*c)


class FeatureExtraction(nn.Module):
    """4-unit DenseEdgeConv stack -> 60-d surface descriptor per point."""
    conv_channels: int = 24
    num_convs: int = 4
    conv_num_fc_layers: int = 3
    conv_growth_rate: int = 12
    conv_knn: int = 16
    conv_radius: float = 0.8

    @property
    def out_channels(self):
        return self.conv_channels + self.conv_num_fc_layers * \
            self.conv_growth_rate

    @nn.compact
    def __call__(self, pos):
        """pos: (B, N, 3) -> (B, N, out_channels). Static xyz graph,
        computed ONCE and shared by all units."""
        idx = ops.ball_query(self.conv_radius, self.conv_knn, pos, pos)
        x = pos
        for i in range(self.num_convs):
            x = FCLayer(self.conv_channels,
                        activation=None if i == 0 else 'relu',
                        name=f'transform_{i}')(x)
            x = DenseEdgeConv(
                in_channels=self.conv_channels,
                num_fc_layers=self.conv_num_fc_layers,
                growth_rate=self.conv_growth_rate,
                radius=self.conv_radius,
                knn=self.conv_knn,
                relative_feat_only=(i == 0),
                name=f'conv_{i}')(x, pos, idx=idx)
        return x
