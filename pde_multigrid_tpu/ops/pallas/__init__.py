"""Pallas (Mosaic) TPU kernel tier — the native-kernel analogue of the
reference's CUDA `__global__` kernels (SURVEY.md §2.1 native-component note).
"""
