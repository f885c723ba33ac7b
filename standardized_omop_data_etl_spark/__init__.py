"""standardized_omop_data_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference repo
``Answer-ALS-Data/standardized-omop-data-etl`` (a single-node pandas ETL) as an
idiomatic Spark engine:

* a binlog/WAL-style change stream (insert/update/delete/upsert keyed by
  ``doc_id`` with a monotone ``lsn``) applied as key-partitioned MERGE upserts
  against a snapshot-versioned lake table of pre-tokenized training sequences
  (``doc_id string, tokens array<int>, n_tok int, source string``);
* per-key last-writer-wins conflict resolution (window / max_by on
  ``(doc_id, lsn)``), salted two-phase reduction for hot-key skew;
* exactly-once idempotent commits keyed on ``(checkpoint_epoch, partition)``
  with snapshot-property commit dedup;
* schema evolution (added columns, int widening, nested-array compat) applied
  as an ALTER-before-MERGE schema-registry diff;
* per-partition lineage + metrics persisted in the snapshot manifest so replay
  resumes mid-stream;
* an operator library mirroring the reference's transform inventory
  (SURVEY.md §2) plus large-scale training-data ops (dedup families,
  similarity search, text analysis, multimodal plumbing).

Everything is pyspark.sql DataFrames and vectorized Arrow/pandas UDFs — no
per-row Python anywhere in the data path.
"""

__version__ = "0.1.0"
