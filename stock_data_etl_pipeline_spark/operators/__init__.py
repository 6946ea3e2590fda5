from .filters import apply_filters, compile_filter  # noqa: F401
from .windows import latest_per_group, top_k_per_group, first_row_per_group  # noqa: F401
from .aggregates import group_count_zerofill  # noqa: F401
from .pagination import keyset_page  # noqa: F401
