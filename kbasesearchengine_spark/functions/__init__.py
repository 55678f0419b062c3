"""Vectorized per-row functions: the engine's UDF surface.

Reference analog: the TransformType scalar transforms and the ES standard
analyzer (see /root/reference/lib/src/kbasesearchengine/parse/KeywordParser.java
and search/ElasticIndexingStorage.java:1734-1742). Everything here is
numpy/pandas-vectorized — no row-at-a-time Python UDFs.
"""
