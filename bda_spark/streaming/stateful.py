"""Custom stateful streaming operator (SURVEY.md §2.9 T7, deepened):
per-symbol ONLINE feature statistics maintained in GroupState across
micro-batches via ``applyInPandasWithState`` — the Structured
Streaming primitive for operators the built-in windowed aggregations
cannot express. Here: a running Welford mean/variance plus an EWMA of
the price, with a drift flag when a batch's mean leaves the running
±2σ band — the monitoring signal a continuous-training deployment
(the reference's trainer loop, NEW_train_offset_3_10min.py:124-211)
needs to decide WHEN retraining is worth it, not just on a timer.

State is one fixed-size row per key — (n, mean, m2, ewma) — so state
store size is O(symbols), not O(events): the operator streams any
volume at constant memory. Arithmetic uses Chan's parallel Welford
combine, so each micro-batch folds in as one vectorized numpy step
(no per-row Python loop).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("batch_rows", LongType()),
        StructField("n_total", LongType()),
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("drift", BooleanType()),
    ]
)


def fold_running_stats(
    n: int,
    mean: float,
    m2: float,
    ewma: float | None,
    v: np.ndarray,
    alpha: float,
) -> tuple[int, float, float, float, float]:
    """Fold one ORDERED value array into running (n, mean, m2, ewma).

    Welford via Chan's parallel combine — the batch's own moments merge
    into the carried state in one vectorized step. EWMA in closed form:
    the carried value decays by (1-alpha)^k and the batch contributes
    its geometrically-weighted sum. Pure and deterministic for a given
    value order; exposed at module level so multi-chunk order handling
    is testable without a streaming harness."""
    k = len(v)
    if k == 0:
        return n, mean, m2, ewma, mean
    b_mean = float(v.mean())
    b_m2 = float(((v - b_mean) ** 2).sum())
    delta = b_mean - mean
    new_n = n + k
    mean = mean + delta * k / new_n
    m2 = m2 + b_m2 + delta * delta * n * k / new_n
    if ewma is None:
        ewma = float(v[0])
        if k > 1:
            rest = v[1:]
            d = (1.0 - alpha) ** np.arange(k - 2, -1, -1)
            ewma = ewma * (1.0 - alpha) ** (k - 1) + float(alpha * (d * rest).sum())
    else:
        decay = (1.0 - alpha) ** np.arange(k - 1, -1, -1)
        ewma = ewma * (1.0 - alpha) ** k + float(alpha * (decay * v).sum())
    return new_n, mean, m2, ewma, b_mean


def running_feature_stats(
    ticks: DataFrame,
    value_col: str = "price",
    alpha: float = 0.1,
    order_col: str = "timestamp",
) -> DataFrame:
    """Per-symbol stateful stream: one output row per (symbol,
    micro-batch) snapshotting the RUNNING statistics after folding the
    batch in. ``ticks`` must be a streaming frame with symbol,
    ``value_col`` and ``order_col`` columns."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            n, mean, m2, ewma = state.get
        else:
            n, mean, m2, ewma = 0, 0.0, 0.0, None
        prev_mean, prev_n, prev_m2 = mean, n, m2
        # EWMA is order-dependent, and applyInPandasWithState guarantees
        # neither Arrow-chunk order nor within-chunk order for a group
        # spanning multiple chunks — so gather the WHOLE micro-batch for
        # the group first and sort once globally by order_col. Sorting
        # each chunk individually (the r3 version) left the fold at the
        # mercy of arbitrary chunk arrival order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(order_col)
        v = batch[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        batch_rows = len(v)
        if batch_rows == 0:
            return
        n, mean, m2, ewma, batch_mean = fold_running_stats(
            n, mean, m2, ewma, v, alpha
        )
        std = float(np.sqrt(m2 / n)) if n > 0 else 0.0
        # drift is judged against the PRE-batch band: "did this batch
        # leave the envelope the history predicted" — the post-batch σ
        # would be inflated by the very jump being tested
        prev_std = float(np.sqrt(prev_m2 / prev_n)) if prev_n > 0 else 0.0
        drift = prev_n > 0 and abs(batch_mean - prev_mean) > 2.0 * prev_std
        state.update((n, mean, m2, ewma))
        yield pd.DataFrame(
            [
                {
                    "symbol": symbol,
                    "batch_rows": batch_rows,
                    "n_total": n,
                    "mean": mean,
                    "std": std,
                    "ewma": ewma,
                    "drift": bool(drift),
                }
            ]
        )

    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        RUNNING_STATS_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


MG_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("weights", ArrayType(LongType())),
        StructField("subtracted", LongType()),
        StructField("seq", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("seq", LongType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("err_bound", LongType()),
    ]
)


def streaming_frequent_items(
    items: DataFrame,
    col: str,
    counters: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming heavy hitters: the Misra-Gries summary
    (operators.sketch.frequent_items) as a STATEFUL streaming operator
    — continuously-maintained approximate top-k ("trending keys") over
    an unbounded stream, at fixed memory.

    Sharding: items hash into ``n_shards`` groups, so the state store
    holds n_shards summaries of ``counters`` slots each — bounded
    forever, whatever the key cardinality — and every item lives in
    EXACTLY one shard, so per-item estimates never need cross-shard
    merging. Each micro-batch folds the shard's new arrivals into the
    carried summary (vectorized value_counts, the same mergeable-
    summaries compaction rule as the batch operator) and emits a
    monotonically-sequenced snapshot of the shard; a consumer takes
    each shard's latest seq and has, at all times,
        est_count <= true_count <= est_count + err_bound
    for every item, with any item heavier than err_bound guaranteed
    present in its shard's snapshot.

    Every snapshot carries one null-item row holding the shard's
    err_bound, so the bound survives even when compaction empties the
    summary (a uniform batch can subtract every counter away — the
    items are gone, and the bound row is what proves their counts
    were below it)."""
    n_slots = int(counters)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            s_items, s_weights, subtracted, seq = state.get
            summary = dict(zip(list(s_items), [int(w) for w in s_weights]))
            subtracted = int(subtracted)
        else:
            summary, subtracted, seq = {}, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True)
        for item, c in batch["item"].value_counts().items():
            summary[item] = summary.get(item, 0) + int(c)
        if len(summary) > n_slots:
            cut = sorted(summary.values(), reverse=True)[n_slots]
            summary = {i: w - cut for i, w in summary.items() if w > cut}
            subtracted += cut
        seq = int(seq) + 1
        state.update(
            (list(summary.keys()), list(summary.values()), subtracted, seq)
        )
        yield pd.DataFrame(
            {
                "shard": int(shard),
                "seq": seq,
                "item": list(summary.keys()) + [None],
                "est_count": list(summary.values()) + [0],
                "err_bound": subtracted,
            }
        )

    sharded = items.select(
        F.pmod(F.xxhash64(F.col(col)), F.lit(int(n_shards))).alias("shard"),
        F.col(col).cast("string").alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        MG_OUTPUT_SCHEMA,
        MG_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


BREAKOUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp", LongType()),
        StructField("price", DoubleType()),
        StructField("prev_high", DoubleType()),
    ]
)


def breakout_highs(
    ticks: DataFrame,
    value_col: str = "price",
    order_col: str = "timestamp",
) -> DataFrame:
    """Per-symbol record-high (breakout) detector on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` with TYPED state variables. Emits one
    row per new all-time high, carrying the previous high — a signal
    windowed aggregation cannot express (output cadence follows the
    DATA, state must survive arbitrarily many quiet micro-batches).

    State is a single-value ``ValueState`` per symbol (the running
    high), so the state store holds O(symbols) doubles forever —
    unbounded streams at constant memory, same guarantee as
    ``running_feature_stats`` but via the 4.x typed-state API.
    Micro-batch chunks are concatenated and sorted once by
    ``order_col`` before folding (order matters: each breakout
    compares against the high BEFORE it).

    Runtime gate: transformWithStateInPandas speaks protobuf to its
    state server, so EXECUTING the query requires the ``protobuf``
    package (absent in this container — the replay test skips itself;
    plan construction and the output schema are still exercised).
    ``running_feature_stats`` above covers the same T7 semantics on the
    protobuf-free ``applyInPandasWithState`` API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HighWater(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._high = handle.getValueState("high", "high double")

        def handleInputRows(self, key, rows, timerValues):
            (symbol,) = key
            chunks = [pdf for pdf in rows if len(pdf)]
            if not chunks:
                return
            batch = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            prev = self._high.get()
            # an all-NaN first batch stores (None,): guard the value,
            # not just the row
            high = (
                float(prev[0])
                if prev is not None and prev[0] is not None
                else None
            )
            out = []
            for ts, price in zip(batch[order_col], batch[value_col]):
                if pd.isna(price) or pd.isna(ts):
                    continue
                price = float(price)
                if high is None or price > high:
                    out.append(
                        {
                            "symbol": symbol,
                            "timestamp": int(ts),
                            "price": price,
                            "prev_high": high,
                        }
                    )
                    high = price
            if high is not None:
                self._high.update((high,))
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return ticks.groupBy("symbol").transformWithStateInPandas(
        HighWater(), BREAKOUT_SCHEMA, "append", "None"
    )
