"""ai_knowledge_graph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first rebuild of the *capabilities* of
sixscripts-ai/ai-knowledge-graph (text -> SPO triples -> standardized
entities -> inferred relationships -> materialized graph), re-expressed as
lazy, columnar, shuffle-aware DataFrame transforms:

- chunked extraction      (reference: src/knowledge_graph/text_utils.py,
                           main.py:90-218) -> pandas UDF + posexplode +
                           mapInPandas batch scoring
- entity standardization  (reference: entity_standardization.py:33-181)
                           -> hash aggregations + window canonical selection +
                           token/stem-blocked self-joins + broadcast apply
- relationship inference  (reference: entity_standardization.py:183-352,
                           661-752) -> self equi-joins, anti-joins and
                           iterative connected components
- graph materialization   (reference: graph_store.py) -> nodes/edges tables
                           bucketed by entity hash, plus a DataFrame query
                           layer (neighbors / k-hop / path / search)

Everything here is built on the public Apache Spark / PySpark API only.
"""

__version__ = "0.1.0"
