"""PySpark-native property-graph + data-pipeline engine.

Re-expresses the query and data-processing capabilities of
salrashid123/gsuites_gcp_graphdb (a Go ETL tool emitting Gremlin
upserts into JanusGraph; see /root/reference/main.go) as an idiomatic
PySpark engine:

- labeled property graph as two DataFrames (``graph.schema``),
- idempotent merge-on-natural-key upserts (``graph.upsert``),
- a Gremlin-flavoured traversal builder compiling to DataFrame plans
  (``graph.traversal``),
- iterative fixpoint analytics (``graph.algorithms``),
- GraphML/GraphSON export (``graph.export``),
- plus large-scale training-data pipeline operators: dedup,
  similarity search, text analysis, multimodal plumbing, streaming
  (``operators``, ``streaming``).

Everything compiles to stock DataFrame operations so Catalyst/AQE own
optimization; no RDDs, no custom rules (SURVEY.md §7).
"""

__version__ = "0.1.0"
