from .normalize import (  # noqa: F401
    NULL_SENTINELS,
    normalize_key,
    normalize_null_sentinels,
    valid_ticker,
)
from .notify import (  # noqa: F401
    failed_run_embed,
    notify_state_change,
    state_embed,
    webhook_payload,
)
from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
