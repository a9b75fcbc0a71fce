"""chaos_spark — a from-scratch, PySpark-native link-graph analytics engine.

Capabilities modeled on the *Chaos* scale-out graph-processing system
(bindscha/chaos; Roy, Bindschaedler, Malicevic, Zwaenepoel, SOSP 2015) and its
single-machine ancestor *X-Stream* (SOSP 2013), re-expressed Spark-first:

- the edge-centric scatter -> shuffle -> gather/apply superstep loop becomes
  ``join -> groupBy.agg -> join`` DataFrame plans driven from the driver
  (``chaos_spark.engine``),
- streaming partitions become range/hash partitioning + an Arrow-backed
  per-partition CSR fast path (``chaos_spark.csr``),
- slipstore-style flat storage becomes Parquet/Iceberg tables with
  checkpoint manifests for mid-job resume (``chaos_spark.checkpoint``),
- work stealing / load balance becomes AQE + explicit salted hub splitting
  (``chaos_spark.graph.salt_edges``).

See SURVEY.md for the full reference mapping. The reference mount was empty
at survey time, so parity citations point at the published papers ([C15],
[X13]) rather than file:line.
"""

__version__ = "0.1.0"
