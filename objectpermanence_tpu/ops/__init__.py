"""Numerical primitives: box geometry, scanned LSTM cells, attention,
homography/grid projection, and Pallas TPU kernels for the hot paths."""
