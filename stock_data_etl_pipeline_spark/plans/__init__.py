from .catalog import CATALOG, oracle_sql, queries  # noqa: F401
