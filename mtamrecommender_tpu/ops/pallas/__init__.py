"""Pallas TPU kernels for the hot ops (flag-guarded; jnp reference paths
remain the default and the parity oracle — SURVEY.md section 7.7)."""
