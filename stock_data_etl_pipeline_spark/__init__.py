"""PySpark-native analytics engine with the query and data-processing
capabilities of the `stock-data-etl-pipeline` reference.

Everything here is Spark-first: operators are declared with the DataFrame /
SQL API so Catalyst + Tungsten choose the physical plan (predicate pushdown,
column pruning, broadcast joins, whole-stage codegen, AQE). Python-side
execution (Pandas UDF / applyInPandas / mapInPandas) is reserved for the few
operators the built-ins genuinely can't express.

Layout:
    session      SparkSession factory (AQE on, UTC, Arrow on)
    schemas      explicit StructTypes (control plane, silver lake, raw JSON)
    sources      table registry, raw-JSON bronze reader, managed MERGE table
    operators    filters / joins / windows / aggregates / pagination / merge
                 / dedup / similarity / multimodal
    functions    scalar helpers (normalization, text analysis, vector math)
    plans        the stock ETL data plane (JSON -> unified wide table)
    streaming    Structured Streaming ingest + event-window operators
    state_machine  ingestion-run state DAG + validated transitions
"""

__version__ = "0.1.0"
