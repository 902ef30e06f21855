"""Operators: index build (K9), BM25 top-k (T1), dedup (P7), ANN."""
