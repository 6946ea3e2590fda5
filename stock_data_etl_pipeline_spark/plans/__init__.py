from .catalog import CATALOG, oracle_sql, queries  # noqa: F401
from . import catalog_text  # noqa: F401  (registers its entries on import)
from . import catalog_streaming  # noqa: F401
from . import catalog_ext  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_corpus  # noqa: F401
