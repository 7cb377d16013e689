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
            [{"user_id": user_id, "n_events": n, "sum_value": s, "last_ts": last, "is_final": True}]
        )
        return
    n, s, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None or batch_max > last else last
    state.update((n, round(s, 2), last))
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
