"""spark-dedup-emtree: PySpark-native near-duplicate detection + hierarchical
bitwise clustering engine (from-scratch re-expression of cmdevries/LMW-tree).

Layout
------
- ``functions``  — vectorized signature / bit / text kernels (NumPy inside Arrow UDFs,
  JVM-side ``pyspark.sql.functions`` where expressible).
- ``sources``    — deterministic synthetic image+caption table (the Iceberg-shaped input),
  parquet loaders, subset semi-join.
- ``operators``  — LSH candidate generation, bit k-means, TSVQ init, streaming EM-tree,
  connected components, dedup suite, similarity search, stats rollups.
- ``plans``      — checkpointed pipeline driver with per-stage lineage + resume.
- ``streaming``  — Structured Streaming ingest of the input table shape.

Everything here derives only from public knowledge: the Apache Spark / PySpark API,
the LMW-tree reference's observable semantics, and published papers (TopSig, EM-tree,
MinHash/SimHash LSH, connected components in MapReduce).
"""

__version__ = "0.1.0"
