"""Pallas TPU kernels: fused collide-and-stream step."""
