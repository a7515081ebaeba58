"""aws_flight_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (cd3331/aws-flight-data-pipeline): OpenSky-style state-vector
ingestion, enrichment/derived-column ETL, per-aircraft sequence operators,
four-dimension data-quality scoring with anomaly detection and quarantine, and
the full analytical SQL surface (window functions, approximate aggregates,
broadcast dimension joins, proximity range joins, z-score anomaly queries) —
all re-expressed as idiomatic Spark DataFrame plans so Catalyst/Tungsten/AQE
pick the physical strategy, plus the LLM-training-data operators (dedup,
similarity search, text analysis, multimodal column plumbing) the reference
lacks.

Layout:
  sources/    readers + sinks (raw JSON state vectors, parquet tables, quarantine)
  functions/  pure Column builders (units, geo, categories, text, vectors, hashing)
  operators/  DataFrame -> DataFrame transforms (enrich, sequence, quality,
              anomaly, dedup, similarity, multimodal)
  plans/      the declared query inventory: every query paired with a DuckDB
              oracle SQL string for engine-vs-oracle correctness checking
  streaming/  Structured Streaming variants (micro-batch, watermark dedup,
              stateful anomaly tracking)
"""

__version__ = "0.1.0"
