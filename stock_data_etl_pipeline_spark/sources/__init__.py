from .bucketed import write_bucketed  # noqa: F401
from .fetch import fetch_tickers, http_transport  # noqa: F401
from .managed_table import (  # noqa: F401
    ConcurrentModificationError,
    ManagedTable,
    TableExistsError,
)
from .registry import TABLES, load_table, register_views  # noqa: F401
from .jsonl import read_jsonl, to_parquet_documents  # noqa: F401
