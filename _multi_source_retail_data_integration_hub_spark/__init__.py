"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``VaranasiRajesh/-Multi-source-Retail-Data-Integration-Hub``.

The reference (surveyed in /root/repo/SURVEY.md) is a single-process
pandas ETL that builds a Kimball star schema (staging -> dims with SCD2
-> fact -> marts) and serves ~8 analytical SQL queries plus dashboard
aggregations. This package re-expresses all of those semantics
Spark-first:

- ``session``    — SparkSession factory tuned for local[N] and for scale.
- ``schemas``    — explicit StructTypes (no inference in production paths).
- ``sources``    — csv / json / parquet / jdbc readers with lineage columns.
- ``functions``  — native Column-expression function surface (no UDFs for
                   the reference parity surface): cleansing, derived
                   columns, hashing, binning, text analysis, vectors.
- ``operators``  — composite operators: SCD2 merge, pivot+share, top-k,
                   dedup (exact / minhash-LSH / simhash / ngram-jaccard),
                   similarity search (brute-force + LSH-bucketed ANN).
- ``plans``      — end-to-end dataflows: the retail warehouse build and
                   the analytical query surface.
- ``streaming``  — Structured Streaming variants (tumbling-window marts,
                   stateful sessionization) over the events table.
"""

__version__ = "0.1.0"
