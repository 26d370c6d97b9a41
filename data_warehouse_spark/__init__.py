"""data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
jancajthaml-openbank/data-warehouse (reference studied read-only at
/root/reference), re-expressed Spark-first:

- ``sources/``    primary-storage (filesystem-as-database) parsers as native
                  Spark column expressions; parquet table catalog.
- ``operators/``  the reference's full query surface (tenants / accounts /
                  transfers / balance: filter + sort + paginate + sum) as pure
                  DataFrame functions, plus 100 TB-scale extensions
                  (dedup, similarity search, text analysis).
- ``functions/``  scalar coercions (status enum, ISO timestamps, exact
                  decimals) and vector math.
- ``streaming/``  incremental ingestion (high-watermark batch + Structured
                  Streaming) with idempotent MERGE semantics.
- ``api/``        GraphQL façade (graphql-core) whose resolvers compile to
                  DataFrame plans with DataLoader-style batching.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
