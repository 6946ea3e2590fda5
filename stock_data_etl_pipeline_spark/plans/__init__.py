# NOTE: the catalog accessors are deliberately NOT re-exported here —
# `plans.queries` must unambiguously mean the queries.py submodule
# (control-plane query service); use plans.catalog.queries()/
# oracle_sql() for the catalog surface.
from .catalog import CATALOG  # noqa: F401
from . import catalog_text  # noqa: F401  (registers its entries on import)
from . import catalog_streaming  # noqa: F401
from . import catalog_ext  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_tpch_sub  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_corpus  # noqa: F401
from . import catalog_analytics  # noqa: F401
