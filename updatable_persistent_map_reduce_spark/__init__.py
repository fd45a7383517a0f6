"""updatable_persistent_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-design (NOT a port) of the capabilities of
``ayende/updatable-persistent-map-reduce`` (reference at /root/reference):
a persistently materialized, incrementally updatable GROUP-BY aggregation
engine (reference: MapReduce/Executer.cs) re-expressed on Spark's
DataFrame/Catalyst stack, plus the relational + LLM-data-pipeline operator
surface needed to make it a complete analytics engine at 100 TB scale.

Layout
------
- ``session``   : SparkSession factory tuned for local[32] testing and
                  cluster-scale defaults (AQE, Arrow, partition sizing).
- ``sources``   : table catalog over the driver's parquet star schema.
- ``functions`` : reusable column expressions (stable bucket hash, text
                  shingles, vector math) — all JVM-side Catalyst exprs.
- ``operators`` : the query surface (relational Tier C, LLM Tier B).
- ``plans``     : MapReduceView — the updatable persistent map-reduce
                  core (Tier A semantics: latest-wins upsert, dirty-key
                  incremental recompute, point-lookup query).
- ``streaming`` : the same view maintained by Structured Streaming.
"""

__version__ = "0.1.0"
