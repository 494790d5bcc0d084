"""utxo_to_parquet_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of romanz/utxo-to-parquet
(reference: /root/reference/src/main.rs) on Apache Spark:

- ``kernels``   — pure-Python decode kernels (Bitcoin Core varint, amount
                  decompression, script decompression) with no Spark deps.
- ``sources``   — the UTXO snapshot source: a two-pass splittable reader
                  that turns Bitcoin Core's non-splittable ``dumptxoutset``
                  stream into a parallel DataFrame scan.
- ``sinks``     — the query-optimized Parquet sink (per-partition sort on
                  ``script``, ZSTD, small row groups for page pruning).
- ``functions`` — Column-expression versions of the scalar kernels (UDF-free
                  where possible) plus text / vector helpers.
- ``operators`` — the relational query library + large-scale pipeline
                  operators (dedup, similarity search, text analysis,
                  multimodal columns).
- ``streaming`` — Structured Streaming demos over the events table.

Design stance (SURVEY.md §7): the engine IS Spark SQL; this package
contributes the domain source, scalar kernels, and an operator library —
no custom Catalyst rules are needed.
"""

__version__ = "0.1.0"
