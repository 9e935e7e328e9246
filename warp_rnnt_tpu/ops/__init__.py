"""Pallas TPU kernels (imported lazily by the core dispatcher to keep CPU
paths import-light)."""
