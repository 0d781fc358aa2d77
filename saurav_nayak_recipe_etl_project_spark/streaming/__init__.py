"""Structured Streaming operators (file-source ingest, windowed aggs,
sessionization, stream joins, keyed upserts, streaming dedup)."""

from __future__ import annotations

DEFAULT_STREAM_TIMEOUT = 120


def await_or_raise(query, timeout: int = DEFAULT_STREAM_TIMEOUT) -> None:
    """Block on a streaming query and FAIL LOUDLY on timeout.

    `StreamingQuery.awaitTermination(timeout)` returns False when the
    timeout elapses with the query still running; ignoring that boolean
    lets a caller read partial sink output while the query keeps
    writing, and a later restart on the same checkpoint dies with a
    concurrent-stream error. Here a timeout stops the query and raises,
    so no caller ever observes a half-written sink as success.
    """
    done = query.awaitTermination(timeout)
    if not done:
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} still running after "
            f"{timeout}s; stopped to avoid partial sink reads "
            f"(raise the timeout for larger drops)"
        )
    # Surface any exception the query terminated with (awaitTermination
    # with a timeout can return True for a FAILED query on some paths).
    if query.exception() is not None:
        raise query.exception()
