"""Pallas TPU kernels for the hot ops (vocoder MRF stacks)."""
