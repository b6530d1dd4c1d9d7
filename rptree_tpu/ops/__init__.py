"""Compute kernels: projection, segmented median build, traversal, rerank,
sparse batch ops, and single-vector convenience ops."""
