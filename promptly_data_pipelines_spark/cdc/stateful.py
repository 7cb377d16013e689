"""Custom stateful streaming operator (SURVEY.md §2h/T6 extension):
per-user activity tracking via ``applyInPandasWithState`` — the
escape hatch when built-in windowed aggregations can't express the
state machine (running counters that survive across micro-batches,
custom eviction, per-key session logic beyond gap windows).

State model: per user_id keep (n_events, sum_value, last_ts). Each
micro-batch folds its rows into the state and emits the updated
snapshot row. With ``state_ttl_ms`` set, idle keys time out on
processing time and emit a final row (is_final=True) — the pattern
for flushing abandoned sessions downstream. Caveat learned the hard
way: with a processing-time timeout, ``availableNow`` keeps running
empty micro-batches (~0.5 s each) until every key's timeout fires —
so finite drains (tests, backfills) should run with no TTL, and TTL
belongs on genuinely continuous queries.
"""

from __future__ import annotations

import functools
from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, last_ts timestamp, is_final boolean"
)
STATE_SCHEMA = "n_events bigint, sum_value double, last_ts timestamp"


def _track_user(
    state_ttl_ms: int | None,
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, s, last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": round(s, 2), "last_ts": last, "is_final": True}]
        )
        return
    n, s, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None or batch_max > last else last
    # state keeps FULL precision — rounding belongs to the emitted
    # snapshot only. Storing round(s, 2) and adding to it compounds
    # the rounding error across micro-batches, making sum_value depend
    # on batch boundaries (three 0.004 deliveries would emit 0.0, one
    # delivery of the same rows 0.01).
    state.update((n, s, last))
    if state_ttl_ms is not None:
        state.setTimeoutDuration(state_ttl_ms)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": round(s, 2), "last_ts": last, "is_final": False}]
    )


def user_activity_tracker(live: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """live: the decoded CDC stream (cdc.streaming.live_rows shape).
    Returns the per-user running snapshot stream. State lives in the
    checkpointed state store per key; Arrow moves each group's batch
    into pandas. ``state_ttl_ms``: evict idle keys after this much
    processing time and emit their final row (continuous queries
    only — see module caveat)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return live.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        functools.partial(_track_user, state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API) — the successor
# to applyInPandasWithState above: typed per-key state handles
# (Value/List/Map), timers, TTL, and initial-state seeding. Both forms are
# kept: the tracker above shows the legacy API the ecosystem still runs;
# the dedup below is the shape new code should take.
# ---------------------------------------------------------------------------

try:  # the API needs pyspark >= 4.0 AND protobuf (its Python<->JVM state
    # protocol is protobuf-serialized: pyspark/sql/streaming/proto/
    # StateMessage_pb2 imports google.protobuf at runtime). In-sandbox
    # infeasibility proof, mirroring operators/lakehouse.py:15:
    #   $ python -c "import google.protobuf"   -> ModuleNotFoundError
    #   $ pip download protobuf --no-deps      -> "No matching
    #     distribution found for protobuf" (offline index)
    # Re-probed in the ROUND 13 session (2026-08-15): google.protobuf
    # still ModuleNotFoundError; pypi.org still DNS-dead (Errno -2).
    # so the operator is code-complete but executable only where
    # protobuf exists; the test skips with this reason. The legacy
    # applyInPandasWithState path above has no such dependency and IS
    # executed by the suite.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

DEDUP_OUTPUT_SCHEMA = "content_hash string, doc_id bigint, lang string, n_dupes_dropped bigint"


class StreamingExactDedup(StatefulProcessor):
    """Cross-micro-batch exact dedup of a document stream, keyed by
    content hash: the FIRST arrival of a hash is emitted (min doc_id
    within its batch — deterministic) with ``n_dupes_dropped`` counting
    the SAME-batch duplicates that arrived with it; arrivals in any
    LATER micro-batch are dropped silently (append mode cannot revise
    an already-emitted row, so cross-batch redeliveries are not
    reflected in the counter — track them via the state-store metrics
    if the accounting matters). The training-
    ingest use: Kafka replays and multi-source crawls re-deliver
    identical documents days apart; windowed aggregation can't express
    "seen ever" (state must outlive any window), arbitrary state can.
    State per key is ONE boolean-sized row sharded by hash — at 100 TB
    the store scales horizontally with the key space and a TTL
    (ttlDurationMs on the ValueState) bounds it where business rules
    allow re-admitting ancient content."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd  # executor-side

        (content_hash,) = key
        n = 0
        first = None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            cand = pdf.loc[pdf["doc_id"].idxmin()]
            if first is None or cand["doc_id"] < first["doc_id"]:
                first = cand
        if n == 0:
            return
        if self.seen.exists():
            # duplicate delivery of an already-admitted document
            return
        self.seen.update((True,))
        yield pd.DataFrame(
            [
                {
                    "content_hash": content_hash,
                    "doc_id": int(first["doc_id"]),
                    "lang": first["lang"],
                    "n_dupes_dropped": int(n - 1),
                }
            ]
        )

    def close(self) -> None:
        pass


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """docs: a streaming frame of (doc_id, lang, text). Returns the
    first-arrival stream (one row per distinct content hash, ever) via
    transformWithStateInPandas in append mode, timeMode None (bounded
    drains — see the module caveat on processing-time timers)."""
    from pyspark.sql import functions as F

    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires protobuf, absent in this "
            "environment (see the import-guard comment for the proof)"
        )
    hashed = docs.select(
        F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " ")))).alias("content_hash"),
        "doc_id",
        "lang",
    )
    return hashed.groupBy("content_hash").transformWithStateInPandas(
        statefulProcessor=StreamingExactDedup(),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
