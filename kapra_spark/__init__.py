"""kapra_spark — a from-scratch PySpark-native time-series rollup +
downsample + retention engine with the query capabilities of the
DiTo97/kapra reference (a single-node (k,P)-anonymity engine for
time-series tables, Shou et al. 2011/2013).

Everything here is idiomatic Spark: DataFrame/SQL logical plans
optimized by Catalyst, Arrow-vectorized pandas UDFs for the kernels
Spark lacks (SAX encoding, greedy grouping, Gorilla compression), and
explicit partitioning/salting for 10^12-sequence scale.

Subpackages
-----------
functions   vendored numeric kernels (znorm/PAA/SAX, Gorilla, hashes)
operators   relational + clustering operators (rollup, gap-fill,
            grouping, dedup, similarity, text analysis)
sources     readers/writers (parquet-or-Iceberg storage, CSV compat)
plans       end-to-end pipelines (kapra/naive anonymization, cascade)
streaming   structured-streaming variants of the rollup cascade
"""

__version__ = "0.1.0"
