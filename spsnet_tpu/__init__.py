"""spsnet_tpu — a TPU-native LiDAR 3D object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SPSNet/OpenPCDet
(reference: AlanLiangC/SPSNet): config-driven datasets (KITTI/Waymo/nuScenes),
a zoo of point-based detectors built from pluggable modules, fused TPU kernels
for point-cloud ops, SPMD data-parallel training over a `jax.sharding.Mesh`,
and the SPSNet stability (point-uncertainty) subsystem.

Design stance (not a port): whole frame batches flow through a single jitted
XLA program over fixed-shape padded tensors — encoder, sampling, heads, target
assignment and NMS included. Ragged/stacked layouts from the CUDA reference are
replaced by `(B, N, ...)` dense tensors plus validity masks sized to MXU/VMEM
tiles.
"""

__version__ = "0.1.0"
