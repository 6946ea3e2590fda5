"""Driver-level retry/backoff — the reference's Celery autoretry policy.

Reference (/root/reference/services/workers/tasks/base.py:17-23): retry
RetryableError up to 3 times, exponential backoff capped at 600 s, with
jitter. Spark task retries cover executor failures; this wrapper covers
driver-orchestrated steps (a lock-timeout-style transient in metadata
sync, an external API hiccup in fetch).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import Any, TypeVar

T = TypeVar("T")


class RetryableError(RuntimeError):
    """Transient failure: safe to re-run the step."""


def with_retry(fn: Callable[[], T], *, max_retries: int = 3,
               backoff_base: float = 1.0, backoff_cap: float = 600.0,
               jitter: bool = True,
               sleep: Callable[[float], Any] = time.sleep,
               retry_on: tuple[type[BaseException], ...] = (RetryableError,)) -> T:
    """Run ``fn``; on a retryable error sleep min(cap, base*2^attempt)
    (full jitter) and retry, up to ``max_retries`` retries. Non-retryable
    exceptions propagate immediately, like the reference's autoretry_for
    allowlist."""
    attempt = 0
    while True:
        try:
            return fn()
        except retry_on:
            if attempt >= max_retries:
                raise
            delay = min(backoff_cap, backoff_base * (2 ** attempt))
            if jitter:
                delay = random.uniform(0, delay)
            sleep(delay)
            attempt += 1
