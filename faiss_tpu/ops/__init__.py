"""Compute kernels: distances, k-select, codecs, clustering ops."""
