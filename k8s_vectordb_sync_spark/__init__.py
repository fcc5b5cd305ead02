"""k8s_vectordb_sync_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of wiggitywhitney/k8s-vectordb-sync.

The reference (a Go Kubernetes controller, see /root/reference) is in database
terms a streaming CDC/ETL pipeline: change-stream source -> metadata projection
-> noise filters -> per-key debounce/dedup (last-state-wins) -> micro-batched
upsert/delete sink, plus a periodic full-snapshot reconciliation path.

This package re-expresses every one of those dataflow operators Spark-first
(DataFrame / SQL / Catalyst / Structured Streaming), and adds the
large-scale-training-pipeline operators (dedup family, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout:
  functions/   scalar/column-level transforms (projection, text, vectors)
  operators/   dataflow operators (filters, debounce, dedup, similarity, ...)
  sources/     table loading / CDC adapters / catalog discovery
  plans/       pipeline assemblies (batch sync, resync/merge)
  streaming/   Structured Streaming pipelines + sinks
"""

__version__ = "0.1.0"
