"""PySpark-native analytics engine with the query surface of the reference
geospatial pipeline (engraulleite/Geospatial-Data-Pipeline-Spark-Sedona-on-AWS)
plus LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing), designed for horizontal scale.

Layout:
  kernel/     pure-Python geometry kernel (no Sedona/shapely/JVM deps)
  functions/  scalar function surface: ST_* spatial UDFs, text, vector
  operators/  distributed operators: dissolve, dedup, similarity, spatial join
  sources/    readers and sinks (parquet, headerless CSV, JDBC-shaped adapter)
  plans/      fixture derivations, the flagship pipeline, blue-green catalog
  streaming/  structured-streaming operators over the events table
  multimodal/ binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
