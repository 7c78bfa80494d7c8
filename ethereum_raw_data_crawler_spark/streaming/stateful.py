"""Custom stateful streaming operator: per-host crawl counters over the
egress event stream via ``applyInPandasWithState``.

The reference keeps running crawl counters in driver memory and snapshots
them periodically (reference: crawler_service.go:645-724 metrics loop;
crawler_metrics.go:10-43). The streaming recast holds ONE bounded state
row per host in Spark's state store — survives micro-batches and
restarts (checkpointed), scales with the number of hosts (not pages),
and emits an updated (host, n_pages, last_round) row whenever a batch
touches the host. This is the engine's ``applyInPandasWithState``
surface: arbitrary per-key state the built-in windowed aggregations
cannot express (cumulative counters with last-seen bookkeeping).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_STATS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("n_pages", T.LongType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("n_pages", T.LongType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)


def _update(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, last = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last = max(last, int(pdf["fetch_round"].max()))
    state.update((n, last))
    yield pd.DataFrame({"host": [key[0]], "n_pages": [n], "last_round": [last]})


def per_host_counters(events: DataFrame) -> DataFrame:
    """events (url, fetch_round, ...) stream -> one updated cumulative
    (host, n_pages, last_round) row per touched host per micro-batch."""
    hosts = events.withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    )
    return hosts.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType=HOST_STATS,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
