"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch sessionization semantics.

The stream replays the events table in CHRONOLOGICAL file order (mtime-
ordered chunks, one file per trigger) — the realistic shape for a log
stream; arbitrary-order replay would need a watermark wider than the
total disorder, like any event-time stateful operator."""

from __future__ import annotations

import os
import time

import pandas as pd

from name_deduplication_python_spark.streaming.sessions import streaming_sessions

GAP = 1800


def _batch_sessions(pdf: pd.DataFrame) -> tuple[set, set]:
    closed, last_open = set(), set()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        sessions = []
        cur = None
        for _, r in g.iterrows():
            ts = r["ts"].timestamp()
            if cur is None:
                cur = [ts, ts, 1, float(r["value"])]
            elif ts - cur[1] > GAP:
                sessions.append(cur)
                cur = [ts, ts, 1, float(r["value"])]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, cur[3] + float(r["value"])
        if cur is not None:
            sessions.append(cur)
        for s in sessions[:-1]:
            closed.add((uid, s[2], round(s[3], 4)))
        last_open.add((uid, sessions[-1][2], round(sessions[-1][3], 4)))
    return closed, last_open


def test_streaming_sessions_match_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    want_closed, want_open = _batch_sessions(pdf)

    # chronological chunk files with increasing mtimes -> in-order replay
    src = str(tmp_path / "ev")
    os.makedirs(src)
    import glob
    import shutil

    n_chunks = 5
    chunk_sz = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = pdf.iloc[i * chunk_sz : (i + 1) * chunk_sz]
        tmp = str(tmp_path / f"tmp{i}")
        spark.createDataFrame(chunk, schema=ev.schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        path = os.path.join(src, f"chunk{i:02d}.parquet")
        shutil.move(part, path)
        os.utime(path, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_sessions(stream, gap_sec=GAP, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got_pdf = spark.sql("select * from sess").toPandas()
    got = {
        (r["user_id"], r["n_events"], round(r["session_value"], 4))
        for _, r in got_pdf.iterrows()
    }
    # everything emitted is a true session (closed, or an open tail that
    # the final watermark advance flushed via timeout/eager emit)
    assert got <= (want_closed | want_open), got - (want_closed | want_open)
    # all batch-closed sessions must be emitted
    assert want_closed <= got, want_closed - got
    # no session double-emitted (append = exactly once per session key)
    assert not got_pdf.duplicated(["user_id", "session_start"]).any()
