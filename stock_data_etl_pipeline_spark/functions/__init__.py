from .normalize import (  # noqa: F401
    NULL_SENTINELS,
    normalize_key,
    normalize_null_sentinels,
    valid_ticker,
)
