"""Compute ops: histogram, splitters, partition kernels, sort engines."""
