"""Constraint, scoring, graph, dedup, similarity and text operators.

Each module is pure pyspark.sql (plus Arrow-vectorized pandas UDFs where a
matrix kernel genuinely needs NumPy). No per-row Python anywhere.
"""
