"""Slowly-changing-dimension (SCD Type 2) maintenance: dimension
history as append-only versioned rows — (key, tracked attributes,
valid_from, valid_to, is_current) — where an attribute change CLOSES
the current version (valid_to = change time) and opens a new one,
instead of overwriting (Type 1) and losing the history every
time-travel join needs.

The reference's pipeline upserts gold rows in place (Cassandra);
a 100 TB analytics store wants the versioned form so facts can join
"the dimension as of the fact's timestamp" — which is exactly the
bucketed ``interval_join`` (operators/intervals.py) over
[valid_from, valid_to) once this operator maintains those intervals.

Everything is set algebra on DataFrames — one join against the OPEN
slice of the dimension (a fraction of the versioned table; history
rows pass through untouched), no driver loops, no row-at-a-time
merge. Landing the result atomically is the sink's job
(sources/sinks.py overwrite swap or partition-scoped merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _collapse_to_latest(
    updates: DataFrame, key: str, tracked: list[str], effective_col: str
) -> DataFrame:
    """Keep each key's single latest row (max effective time, tracked
    values as deterministic tie-break) — the snapshot-diff CDC batch
    semantics shared by init and apply."""
    latest = Window.partitionBy(key).orderBy(
        F.desc(effective_col), *[F.desc(c) for c in tracked]
    )
    return (
        updates.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_init(
    updates: DataFrame, key: str, tracked: list[str], effective_col: str
) -> DataFrame:
    """Bootstrap a versioned dimension from a first snapshot. A key
    appearing several times (duplicate delivery, intra-snapshot
    states) collapses to its latest row — the same batch semantics as
    ``scd2_apply``, so the bootstrap can never seed two open versions
    of one key."""
    if not tracked:
        raise ValueError("scd2_init: tracked must name >= 1 attribute")
    updates = _collapse_to_latest(updates, key, tracked, effective_col)
    return updates.select(
        key,
        *tracked,
        F.col(effective_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str,
) -> DataFrame:
    """Fold one batch of updates into a versioned dimension; returns
    the NEW full dimension table.

    Batch semantics: if a key appears several times in ``updates``,
    only its LATEST row (max ``effective_col``, deterministic) is
    applied — intra-batch intermediate states are collapsed, the way
    snapshot-diff CDC feeds behave. Unchanged updates are no-ops
    (idempotent re-delivery is safe). New keys open their first
    version; changed keys close the current version at the update's
    effective time and open a new one.

    Out-of-order protection: an update STRICTLY OLDER than the open
    version's ``valid_from`` is dropped as a no-op — applying it would
    close the version with ``valid_to < valid_from``, an inverted
    interval every [from, to) consumer (``interval_join``) treats as
    degenerate. Late data that must land in history belongs in a
    backfill/rebuild, not an incremental fold."""
    if not tracked:
        raise ValueError("scd2_apply: tracked must name >= 1 attribute")
    up = _collapse_to_latest(updates, key, tracked, effective_col)

    history = dim.filter(~F.col("is_current"))
    open_rows = dim.filter(F.col("is_current"))

    changed = [
        ~F.col(f"u_{c}").eqNullSafe(F.col(c)) for c in tracked
    ]
    change_pred = changed[0]
    for c in changed[1:]:
        change_pred = change_pred | c

    u = up.select(
        F.col(key).alias("u_key"),
        *[F.col(c).alias(f"u_{c}") for c in tracked],
        F.col(effective_col).alias("u_eff"),
    )
    j = open_rows.join(u, open_rows[key] == u["u_key"], "full_outer")

    # an update older than the open version cannot close it (inverted
    # interval) — treated as a no-op everywhere below
    stale = (
        F.col(key).isNotNull()
        & F.col("u_key").isNotNull()
        & (F.col("u_eff") < F.col("valid_from"))
    )

    # 1) open rows with no update, an update carrying equal values, or
    #    a stale update: pass through unchanged
    untouched = j.filter(
        F.col(key).isNotNull()
        & (F.col("u_key").isNull() | ~change_pred | stale)
    ).select(key, *tracked, "valid_from", "valid_to", "is_current")

    # 2) open rows whose update changes a tracked value: close them
    closed = j.filter(
        F.col(key).isNotNull() & F.col("u_key").isNotNull() & change_pred & ~stale
    ).select(
        key,
        *tracked,
        "valid_from",
        F.col("u_eff").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )

    # 3) new versions: changed keys + brand-new keys
    opened = j.filter(
        F.col("u_key").isNotNull()
        & (F.col(key).isNull() | (change_pred & ~stale))
    ).select(
        F.col("u_key").alias(key),
        *[F.col(f"u_{c}").alias(c) for c in tracked],
        F.col("u_eff").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    return history.unionByName(untouched).unionByName(closed).unionByName(opened)
