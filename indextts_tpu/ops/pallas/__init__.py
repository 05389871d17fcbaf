"""Pallas TPU kernels: fused anti-alias snake activation, decode attention."""
