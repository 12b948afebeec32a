"""Pallas TPU kernels — the hot compute ops.

XLA on this TPU executes arbitrary gathers near-scalar speed (~9ns per
element measured on v5e), which makes the textbook formulations of the
KinFu ops unusable (a 512^3 gather-side integrate spent 11.8 SECONDS per
frame). These kernels restructure the memory access TPU-natively:
windowed DMA + one-hot matmuls instead of gathers, lane-aligned voxel
runs, explicit VMEM residency.
"""

from housescan_tpu.ops.tsdf_pallas import tsdf_integrate_pallas

__all__ = ["tsdf_integrate_pallas"]
