from .bucketed import write_bucketed  # noqa: F401
from .fetch import fetch_tickers, http_transport  # noqa: F401
from .managed_table import ManagedTable, TableExistsError  # noqa: F401
from .registry import TABLES, load_table, register_views  # noqa: F401
