"""Fused Pallas TPU kernels for the hot ops (used when profitable; every op
has a pure-XLA fallback with identical semantics)."""
