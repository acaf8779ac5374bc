"""Structured Streaming layer — SURVEY.md §2.9.

The reference is strictly batch (daily cron, install.sh:12) with
incremental semantics implemented as a sink-watermark scan. This module
is the Spark-native upgrade path the survey sketches: the same pipeline
as a Structured Streaming job where CHECKPOINT STATE replaces the
watermark scan, plus the streaming operators a training-data pipeline
needs (watermarked windowed aggregation, session windows).
"""

from .incremental import (
    run_incremental_normalize,
    stream_scan_run_documents,
)
from .windows import sessionized_stream, windowed_severity_counts

__all__ = [
    "run_incremental_normalize",
    "stream_scan_run_documents",
    "sessionized_stream",
    "windowed_severity_counts",
]
