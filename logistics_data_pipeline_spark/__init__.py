"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference logistics pipeline
(TheDataMaven1985/Logistics_Data_Pipeline), re-expressed Spark-first.

Layout:
    session.py    -- SparkSession builders tuned for local[32] testing and
                     cluster-scale defaults.
    schemas.py    -- explicit StructTypes (bronze event schema etc.).
    functions/    -- scalar helpers (surrogate keys, dow, nullif, try_cast).
    adapters/     -- testdata loading + deterministic logistics-event
                     derivation shared with the DuckDB oracle.
    sources/      -- bronze parquet reader, incremental (anti-join) loader.
    operators/    -- staging, validity, star schema, KPI, monitoring, DQ.
    llm/          -- LLM-data-pipeline extensions: dedup, similarity search,
                     text analysis, multimodal column plumbing.
    streaming/    -- Structured Streaming ingest leg.
    pipeline.py   -- end-to-end composition (the Airflow DAG equivalent).
"""

__version__ = "0.1.0"
