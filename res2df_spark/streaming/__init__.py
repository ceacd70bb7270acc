"""Structured Streaming extensions.

The reference is strictly batch (SURVEY §2.9); these are the streaming
variants of its order-dependent operators, built on watermarks +
stateful processing.  They are an extension, not a parity requirement.
"""

from res2df_spark.streaming.ops import (
    dedup_stream,
    status_change_stream,
    windowed_rollup_stream,
)

__all__ = ["dedup_stream", "status_change_stream", "windowed_rollup_stream"]
