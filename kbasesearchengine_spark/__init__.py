"""kbasesearchengine_spark — a PySpark-native full-text analytics engine.

A from-scratch re-expression of kbaseattic/KBaseSearchEngine's capabilities
(inverted-index build + BM25 top-k search, previously delegated to
Elasticsearch 5.5; see /root/reference/lib/src/kbasesearchengine/search/
ElasticIndexingStorage.java) as idiomatic PySpark: DataFrame/SQL plans,
vectorized Arrow/pandas UDFs for the per-row hot paths (tokenize, varint
codec, WAND), and deterministic, partition-invariant results.

Subpackages
-----------
functions   tokenizer, varint/delta posting codec, BM25 math, transforms
operators   index build, segment merge, top-k query, dedup, ANN, text stats
plans       search_objects/search_types/get_objects facade (query planning)
sources     index table layout, lineage markers, resume
streaming   event replay (batch + Structured Streaming)
"""

__version__ = "0.1.0"
