"""op_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the reference config-driven geospatial ETL pipeline (1kimnet/op-etl),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, Arrow-vectorized pandas UDFs only where built-ins cannot
express the semantics, and partition-planning designed for a
1000-executor cluster even though tests run on local[*].

Layout:
  session    - SparkSession factory tuned for the engine
  config     - declarative source-spec loading (the engine's "queries")
  functions  - scalar column functions (naming, CRS, bbox, json guards)
  geometry   - WKB geometry kernel: envelope, reproject, clip, PIP
  sources    - connectors: GeoJSON/Esri JSON/files, REST/OGC/WFS/Atom
  operators  - dedup, similarity search, text analysis, election, metrics
  sinks      - truncate-and-load, manifest gating, staging writes
  plans      - pipeline compiler: source specs -> DataFrame DAG
  streaming  - Structured Streaming ingest wrapper
"""

__version__ = "0.1.0"
