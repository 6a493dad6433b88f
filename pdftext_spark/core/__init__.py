"""Vectorized extraction kernel — pure numpy/pandas, no Spark imports.

Everything here operates on whole Arrow batches (all turns of a batch at
once) so the Spark layer never runs per-row Python.
"""
