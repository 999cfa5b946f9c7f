"""Custom stateful streaming operator (SURVEY §2.10:
``applyInPandasWithState`` surface).

The reference keeps durable per-pipeline state (the shelve step cursor);
the streaming analog is keyed state with timeouts.  The operator here is a
per-user running profile — event count, value sum, last seen — maintained
across micro-batches with processing-time timeout eviction: the shape of
any custom sessionizer/accumulator a training-data pipeline needs beyond
the built-in ``session_window``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_profile(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update: fold each micro-batch's events for this user into the
    running (count, sum, last_ts) triple.  Arrow-batched both ways."""
    (user_id,) = key
    if state.hasTimedOut:
        # idle-eviction path: the 1h processing-time timer fired with no new
        # data — drop the state and emit nothing.  (Without this branch the
        # timeout handler would re-update + re-arm, so eviction never
        # happened and a duplicate profile row leaked per timeout.)
        state.remove()
        return
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    state.setTimeoutDuration(3600 * 1000)  # evict idle users after 1h
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user profile via applyInPandasWithState.

    Scale shape: state is partitioned by user across executors (RocksDB/
    HDFS-backed state store on a cluster); each micro-batch shuffles only
    that batch's events to their state partitions.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
