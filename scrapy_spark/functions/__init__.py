"""Scalar function layer: URL canonicalization, request fingerprinting,
robots parsing, imaging. Pure Python here; Spark bindings in ``udfs.py``."""
