"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the task brief's stateful-operator slot; the
batch analog with identical semantics is plans/queries.q_user_sessions).

Per user, events are merged with carried state and split into sessions at
silences > gap_sec. Sessions CLOSED by a later event in the same or a
following batch are emitted immediately; the trailing open session stays
in state with an event-time timeout at last_ts + gap, so it is emitted
once the watermark passes the gap (append semantics: every session is
output exactly once).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, session_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n int, val double"


def _session_func(gap_sec: int):
    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events: list[tuple[float, float]] = []
        for pdf in pdfs:
            ts = pdf["ts"].astype("datetime64[us]").astype("int64") / 1e6
            events.extend(zip(ts, pdf["value"].astype(float)))

        out: list[tuple[Any, ...]] = []

        def emit(start: float, last: float, n: int, val: float) -> None:
            out.append(
                (
                    user_id,
                    dt.datetime.utcfromtimestamp(start),
                    dt.datetime.utcfromtimestamp(last),
                    int(n),
                    float(val),
                )
            )

        if state.hasTimedOut:
            start, last, n, val = state.get
            emit(start / 1e6, last / 1e6, n, val)
            state.remove()
        else:
            if state.exists:
                start_us, last_us, n, val = state.get
                cur = [start_us / 1e6, last_us / 1e6, int(n), float(val)]
            else:
                cur = None
            for ts, v in sorted(events):
                if cur is None:
                    cur = [ts, ts, 1, v]
                elif ts - cur[1] > gap_sec:
                    emit(*cur)
                    cur = [ts, ts, 1, v]
                else:
                    cur[1] = max(cur[1], ts)
                    cur[2] += 1
                    cur[3] += v
            if cur is not None:
                # a session whose close deadline already passed the
                # watermark can never be extended — emit it now instead of
                # setting an in-the-past timeout (which Spark rejects)
                wm_ms = state.getCurrentWatermarkMs()
                deadline_ms = int((cur[1] + gap_sec) * 1000)
                if deadline_ms <= wm_ms:
                    emit(*cur)
                    if state.exists:
                        state.remove()
                else:
                    state.update(
                        (int(cur[0] * 1e6), int(cur[1] * 1e6), cur[2], cur[3])
                    )
                    state.setTimeoutTimestamp(deadline_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "session_value",
                ],
            )

    return func


def streaming_sessions(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) -> closed-session
    rows, exactly once per session (append mode)."""
    df = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        df.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
