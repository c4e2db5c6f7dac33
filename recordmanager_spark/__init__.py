"""recordmanager_spark — a PySpark-native metadata-record analytics engine.

A from-scratch re-expression of the capabilities of NatLibFi/RecordManager
(reference surveyed in SURVEY.md) on the Spark DataFrame/SQL stack:

- ``plans.filter_dsl``  — the Mongo-subset filter DSL compiled to Column exprs
  (reference: src/RecordManager/Base/Database/PDODatabase.php:1015-1152).
- ``functions``         — the scalar metadata function library
  (reference: src/RecordManager/Base/Utils/MetadataUtils.php).
- ``operators``         — dataflow operators: dedup (blocking + pairwise
  verification + connected components), group merge, countValues, paginated
  range scan, incremental/deletion semantics, and the large-scale
  training-data extensions (text dedup, ANN similarity, text analysis,
  multimodal plumbing).
- ``sources`` / ``streaming`` — file/XML ingest and incremental pipelines.

Everything is declarative DataFrame/SQL first so Catalyst can push filters,
prune columns and pick join strategies; Python UDFs appear only where string
semantics are irreducibly procedural (ISBN check digits, call numbers).
"""

__version__ = "0.1.0"
