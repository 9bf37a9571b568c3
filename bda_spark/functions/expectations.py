"""Declarative data-quality expectations (the generalization of the
reference's hard-coded 9-constraint producer gate — reference:
tests_pub_sub_schema.py:53-112, engine form functions/cleaning.py
``validate_ticks``): named boolean rules applied as ONE projection,
yielding pass rows, quarantined rows annotated with exactly which
rules failed, and a per-rule violation metrics table.

Scale shape: every rule is a Column expression evaluated in the same
codegen'd projection — N rules cost one scan, not N. The metrics
table is one aggregation of 0/1 casts (map-side combined, |rules|
output rows); pass/quarantine are two filters over the annotated
frame, so a caller that caches it scans the data once for all three
outputs. Nothing touches the driver.

Quarantine-not-drop is the production posture for a 100 TB ingest:
violations land in their own table WITH the failure reasons, so bad
upstream batches are debuggable and replayable instead of silently
shrinking the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FAILED = "failed_expectations"


def annotate_expectations(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """Add a ``failed_expectations`` array column listing every rule
    the row violates (empty array = clean row). NULL rule results
    count as failures — an expectation that cannot be evaluated did
    not pass."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in expectations.items()
            ]
        )
    )
    return df.withColumn(_FAILED, failed)


def apply_expectations(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate all rules in one projection; returns
    ``(passed, quarantined, metrics)``:

    - passed: rows violating nothing (annotation column dropped)
    - quarantined: violating rows, keeping ``failed_expectations``
    - metrics: (expectation, n_violations, violation_rate) per rule —
      one aggregation pass over the same annotated frame

    Caching the annotated frame before consuming all three outputs
    turns the whole gate into a single scan of the input."""
    annotated = annotate_expectations(df, expectations)
    passed = annotated.filter(F.size(_FAILED) == 0).drop(_FAILED)
    quarantined = annotated.filter(F.size(_FAILED) > 0)
    metrics = (
        annotated.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("expectation"),
                            F.array_contains(_FAILED, name)
                            .cast("long")
                            .alias("viol"),
                        )
                        for name in expectations
                    ]
                )
            ).alias("e")
        )
        .groupBy(F.col("e.expectation").alias("expectation"))
        .agg(
            F.sum("e.viol").alias("n_violations"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "expectation",
            "n_violations",
            F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
                "violation_rate"
            ),
        )
    )
    return passed, quarantined, metrics
