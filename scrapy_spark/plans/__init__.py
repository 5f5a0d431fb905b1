"""Logical-plan layer: table schemas and plan helpers."""
