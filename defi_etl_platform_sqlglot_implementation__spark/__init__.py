"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference DeFi ETL platform
(``wolfworldrun/DeFi-ETL-Platform-sqlglot-Implementation-``).

Design stance (SURVEY.md §7.1): pure DataFrame -> DataFrame transform
functions + Spark SQL views. Catalyst/Tungsten provide the optimizer and
physical execution the reference (a single-process pandas pipeline) lacks.
The reference's sqlglot write-once-run-anywhere goal is satisfied by
construction — Spark SQL is the executing dialect; a thin optional
sqlglot-backed transpile helper is kept in ``plans.sqlutil``.

Layout
------
- ``schemas``    : explicit StructTypes for the event envelope + payloads
- ``functions``  : scalar helpers (keccak/EIP-55, hex decode, time, maps)
- ``sources``    : bronze parquet/fixture loaders, Kafka wiring, JSON codec
- ``operators``  : transfers / swaps / tx features / block agg / MEV / risk
                   + scale extensions (dedup, similarity, text stats,
                   multimodal)
- ``plans``      : canonical SQL registry, validation, optional transpile
- ``streaming``  : Structured Streaming variants of the batch transforms
- ``serving``    : the four chart-endpoint computations (JSON shapes)
- ``pipeline``   : run_batch() orchestrator mirroring the reference's
                   ``BlockchainETLPipeline.run`` output contract
"""

__version__ = "0.1.0"
