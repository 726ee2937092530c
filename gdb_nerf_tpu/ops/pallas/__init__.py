"""Pallas TPU kernels for the hot ops (fused alternatives to the XLA path).

Each kernel has a pure-JAX reference implementation elsewhere in ``ops``/
``models``; kernels are opt-in (config ``use_pallas``) and A/B-tested
against the reference path.
"""
