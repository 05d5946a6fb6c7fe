"""Spark-side operators: binning, point-in-time joins, windows, dedup,
similarity, text analysis."""
