from .events import hourly_counts, sessionize, streaming_hourly_counts  # noqa: F401
from .ingest import stream_ingest_bronze  # noqa: F401
