"""Driver-built tiny DataFrames without the per-core Python-worker
fan-out (r16, optimization guide §1.2 step 2 per-task work).

``spark.createDataFrame(py_rows, ...)`` parallelizes the pickled rows
over ``defaultParallelism`` slices; materializing the frame then
launches one Python worker PER SLICE just to unpickle a handful of
rows — on the 32-core bench host that is 32 worker launches (~200 ms
each of executor run time) for a frame of a few hundred rows, and the
pattern sits on hot paths: the hybrid-CC driver union-find result
(three bench queries), ANN index meta rows, tombstone id lists.
Measured r16: a 500-row frame collects in 1.9 s at default slices vs
0.27 s at one slice.

``rows_frame`` sizes the slice count by ROW count (one slice per
``rows_per_slice``, capped at defaultParallelism), so a genuinely
large driver list (the ≤1M-vertex ceiling of the gated union-find)
still parallelizes while the common tiny case pays one worker."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROWS_PER_SLICE = 50_000


def rows_frame(
    spark: SparkSession,
    rows: list,
    schema,
    rows_per_slice: int = ROWS_PER_SLICE,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with row-count-sized
    slicing. Empty lists produce an empty frame with the same schema
    (single empty slice, not one per core)."""
    n_slices = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            (len(rows) + rows_per_slice - 1) // rows_per_slice,
        ),
    )
    if not rows:
        # parallelize([]) with an explicit slice count still yields a
        # valid empty RDD; createDataFrame needs the schema to type it
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], n_slices), schema
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
