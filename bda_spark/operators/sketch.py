"""Sketch-based membership: a blocked Bloom filter in pure DataFrame
algebra (no driver-side sketch object, no UDF).

The 100 TB decontamination / blocklist problem: "does this n-gram /
URL / doc hash appear in a reference set" at corpus scale. An exact
equi-join must move the full distinct reference set (and, if neither
side broadcasts, shuffle the corpus). A Bloom filter caps the
reference side at a FIXED size — ``m_words`` 64-bit words, a few MB
regardless of reference cardinality — at the cost of tunable false
positives and ZERO false negatives, which makes it the ideal
*prefilter*: prune the corpus with the broadcast bitmap, then run the
exact join only on survivors (false positives die there, so the final
answer is exact — the standard two-phase shape).

Variant: a BLOCKED Bloom filter (Putze/Sanders/Singler 2009 — the
cache-line variant carried into production filters, e.g. RocksDB's).
All k probe bits of an item land in ONE 64-bit word:

    word(x) = xxhash64(x)        mod m_words        (block selector)
    mask(x) = OR of k bits taken from 6-bit slices of
              xxhash64(x, seed)                     (bits in block)

so BUILD is one narrow projection + ``bit_or`` groupBy over at most
m_words rows, and PROBE is one broadcast hash join on ``word`` plus a
single ``(bits & mask) = mask`` comparison — one row per probed item,
no per-bit fan-out, no re-aggregation to AND k separate lookups (a
classic Bloom layout would need k joins or a k-row explode + groupBy).
Everything stays inside whole-stage codegen.

False-positive rate: with n items in m = 64 * m_words bits, a block
holds lambda = 64 * n / m items on average; a probe's k bits are set
spuriously with roughly (1 - e^(-k * lambda / 64))^k — within ~2x of
a classic Bloom filter at the same size for lambda <= 8. Size
``m_words`` to ~1 word per reference item (lambda ~ 1) for sub-percent
FP; the prefilter-then-verify composition makes the rate a
performance knob, never a correctness one.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_WORDS = 1 << 16  # default 64 Ki words = 512 KiB bitmap
BLOOM_K = 4


def _word_and_mask(
    col: str | Column, m_words: int, k: int, seed: int
) -> tuple[Column, Column]:
    """(block index, k-bit in-block mask) for each value — the only
    expressions build and probe share, so they agree by construction."""
    c = F.col(col) if isinstance(col, str) else col
    word = F.pmod(F.xxhash64(c), F.lit(m_words))
    h2 = F.xxhash64(c, F.lit(seed))
    # F.shiftleft only accepts a literal shift amount; call the SQL
    # function directly so the bit index can be an expression
    mask = reduce(
        Column.bitwiseOR,
        [
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.shiftright(h2, 6 * i).bitwiseAND(F.lit(63)).cast("int"),
            )
            for i in range(k)
        ],
    )
    return word, mask


def blocked_bloom_bitmap(
    items: DataFrame,
    col: str,
    m_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
    seed: int = 7,
) -> DataFrame:
    """Build the bitmap: (word, bits) with one row per touched block.
    At most ``m_words`` rows whatever the reference cardinality — the
    fixed-size property that lets 10^9 reference items broadcast as a
    sub-MB table. bit_or aggregates partially map-side."""
    word, mask = _word_and_mask(col, m_words, k, seed)
    return (
        items.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 20,
    counters: int = 1024,
    include_bound_row: bool = False,
) -> DataFrame:
    """Approximate top-k heavy hitters via mergeable Misra-Gries
    summaries — the sketch twin of the exact explode->groupBy->top-k
    (plans.textops.keyword_counts) for the 100 TB regime. Returns
    (item, est_count, max_count) for the k heaviest items, where
    est_count <= true count <= max_count.

    Why a sketch at scale: the exact top-k shuffles EVERY distinct key
    (the full vocabulary — billions of rows of shuffle for web-scale
    text). Misra-Gries caps per-partition state at ``counters`` slots,
    so the only shuffle is <= (counters + 1) rows PER PARTITION,
    whatever the cardinality — same economics as the bench's HLL/KLL
    twins (approx_count_distinct / percentile_approx), for top-k.

    Shape: one ``mapInPandas`` pass builds a per-partition summary
    (vectorized value_counts per arrow batch, merged into a dict that
    compacts back to ``counters`` entries by subtracting the
    (counters+1)-th largest weight — the Agarwal et al. 2013 mergeable-
    summaries rule, which is what makes map-side summaries combinable
    by plain addition). Each partition also emits one null-item row
    carrying its total subtracted weight; the final aggregation sums
    summaries by item (a tiny shuffle) and the null rows give the
    global error bound: for every item,
        true_count - est_count <= sum(decrements) <= n / (counters+1),
    and any item with true count above that bound is guaranteed
    present. With ``counters`` >= the true distinct count no
    compaction ever fires, the decrement side is zero, and the result
    is EXACT — the property the registry oracle pins.

    ``mapInPandas`` (not a Python UDF per row): arrow-batch transfer,
    pandas ``value_counts`` does the per-batch counting vectorized.

    ``include_bound_row`` (default OFF — the report is items only, the
    stable public contract): pass True to append one extra row
    (item NULL, est_count 0, max_count = global error bound) so the
    bound stays recoverable even when heavy compaction drains EVERY
    item out of the summaries (an all-equal-weights stream under a
    tiny budget legitimately compacts to nothing — a property-test-
    found case where a bare empty report would hide the fact that
    every count may be as large as the bound). The streaming twin
    (streaming.stateful.streaming_frequent_items) always emits its
    bound as a column, not a sentinel row.
    """
    n_slots = int(counters)

    def summarize(batches):
        import pandas as pd

        summary: dict = {}
        subtracted = 0
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > n_slots:
                cut = sorted(summary.values(), reverse=True)[n_slots]
                summary = {i: w - cut for i, w in summary.items() if w > cut}
                subtracted += cut
        yield pd.DataFrame(
            {
                "item": list(summary.keys()) + [None],
                "weight": list(summary.values()) + [subtracted],
            }
        )

    summaries = (
        df.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .mapInPandas(summarize, "item string, weight long")
    )
    err = summaries.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("weight"), F.lit(0)).alias("_err")
    )
    report = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("weight").alias("est_count"))
        .crossJoin(F.broadcast(err))
        .select(
            "item",
            "est_count",
            (F.col("est_count") + F.col("_err")).alias("max_count"),
        )
        .orderBy(F.desc("est_count"), "item")
        .limit(int(k))
    )
    if not include_bound_row:
        return report
    bound = err.select(
        F.lit(None).cast("string").alias("item"),
        F.lit(0).cast("long").alias("est_count"),
        F.col("_err").cast("long").alias("max_count"),
    )
    return report.unionByName(bound)


def distinct_sketch_table(
    df: DataFrame,
    keys: list[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-key HLL distinct sketches (Spark's datasketches
    ``hll_sketch_agg``): one binary sketch row per ``keys`` group,
    ~2^lgk bytes each (lgk=12 -> ~1.6% relative error), landable as a
    parquet table like any other gold output.

    This is the INCREMENTAL distinct-count pattern exact counts can't
    give, because count(DISTINCT) is not additive: a persisted
    per-(day, key) sketch table answers "distinct users over ANY date
    range / key rollup" by unioning the selected sketch rows —
    seconds over a few hundred rows — instead of rescanning months of
    raw 100 TB data. New days append; history is never recomputed."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(int(lgk))).alias("hll")
    )


def distinct_estimate(
    sketches: DataFrame,
    group: list[str] | None = None,
    sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate a sketch table: union the HLL registers (exact
    register-wise max — order-free, idempotent, so re-unioning
    overlapping ranges never double-counts) per ``group`` (or globally)
    and return the cardinality estimate. Estimates are EXACT while the
    union stays in sparse mode (small true cardinality) and ~1/sqrt(2^lgk)
    relative beyond it."""
    est = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    if group:
        return sketches.groupBy(*group).agg(est)
    return sketches.agg(est)


def blocked_bloom_probe(
    probes: DataFrame,
    col: str,
    bitmap: DataFrame,
    m_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
    seed: int = 7,
) -> DataFrame:
    """Filter ``probes`` to rows whose ``col`` MIGHT be in the set the
    bitmap was built from (false positives possible at the configured
    rate; false negatives impossible — same hash family, same params).

    The bitmap is force-broadcast: the whole point is that its size is
    bounded by m_words, so the probe side — the 100 TB corpus — is
    never shuffled; a left join + null-check keeps rows whose block
    was never touched out via the same single comparison."""
    word, mask = _word_and_mask(col, m_words, k, seed)
    probed = probes.withColumn("_bf_word", word).withColumn("_bf_mask", mask)
    return (
        probed.join(
            F.broadcast(bitmap.withColumnRenamed("word", "_bf_word")),
            "_bf_word",
            "left",
        )
        .filter(
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("_bf_mask")) == F.col("_bf_mask"))
        )
        .drop("_bf_word", "_bf_mask", "bits")
    )


def _dense_bins(n_bins: int) -> "Column":
    """Aggregate expression shared by table build and re-aggregation
    (one body so the fill convention cannot diverge between them): the
    group's ordered dense bin array from its (_bin, _cnt) rows, missing
    bins filled with 0."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("_bin"), F.col("_cnt")))
                ),
                i,
            ),
            F.lit(0).cast("long"),
        ),
    )


def histogram_bounds(df: DataFrame, col: str, num_bins: int = 128,
                     rel_err: float = 1e-3) -> list[float]:
    """Global bin boundaries for a histogram sketch table: num_bins - 1
    quantile split points from one mergeable approxQuantile pass.
    Computed ONCE per metric at table-build time and reused for every
    later day's sketch — all sketches sharing one boundary list is what
    makes them additive."""
    probs = [i / num_bins for i in range(1, num_bins)]
    return sorted(set(df.stat.approxQuantile(col, probs, rel_err)))


def histogram_sketch_table(
    df: DataFrame,
    keys: list[str],
    col: str,
    bounds: list[float],
) -> DataFrame:
    """Per-key quantile-bin histograms — the INCREMENTAL percentile
    pattern, symmetric to ``distinct_sketch_table``: one compact
    (keys..., bin_counts array<long>) row per group, landable as a
    parquet gold table. A new day appends its rows; any date range /
    key rollup answers quantile questions by SUMMING the selected
    rows' bins (histograms are exactly additive) — seconds over a few
    hundred sketch rows instead of rescanning months of raw data.

    Unlike HLL's idempotent register-max union, histogram addition
    double-counts overlapping selections — the selected rows must
    PARTITION the data (which date/key-partitioned sketch tables do by
    construction).

    Scale shape: the bin id is one F.aggregate over the literal
    boundary array (O(num_bins) JVM-side comparisons, no lambda-free
    alternative needed at 128 bins); the first aggregation shrinks the
    corpus to (keys x bins) rows, the second assembles each group's
    ordered bin array. Nothing ever sorts the corpus."""
    bnd = sorted(set(bounds))
    # one Literal node, not len(bnd) per-element lits — the ndarray
    # form; F.lit(list) would re-expand to CreateArray (ADVICE r16)
    arr = F.lit(np.asarray(bnd, dtype=np.float64))
    bin_id = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, v: acc + F.when(F.col(col) > v, 1).otherwise(0),
    )
    n_bins = len(bnd) + 1
    per_bin = (
        df.where(F.col(col).isNotNull())
        .withColumn("_bin", bin_id)
        .groupBy(*keys, "_bin")
        .agg(F.count("*").alias("_cnt"))
    )
    return per_bin.groupBy(*keys).agg(
        _dense_bins(n_bins).alias("bin_counts")
    )


def quantile_estimate(
    sketches: DataFrame,
    bounds: list[float],
    probs: list[float],
    group: list[str] | None = None,
    sketch_col: str = "bin_counts",
) -> DataFrame:
    """Re-aggregate a histogram sketch table: element-wise-sum the
    selected rows' bins per ``group`` (or globally) and read each
    requested quantile off the merged histogram — the answer is the
    UPPER boundary of the bin where the cumulative count crosses
    p * total (max error: one bin width, i.e. ~1/num_bins of the data
    by construction of quantile bounds). Output: group cols +
    ``q_<prob>`` columns.

    The merge is a posexplode + sum keyed by (group, bin) — the only
    shuffle carries |rows| x |bins| tiny (long, long) pairs; the
    per-group cumulative walk runs in one F.aggregate over the merged
    ≤ num_bins array, no window, no sort."""
    bnd = sorted(set(bounds))
    exploded = sketches.select(
        *(group or []),
        F.posexplode(sketch_col).alias("_bin", "_cnt"),
    )
    merged_long = exploded.groupBy(*(group or []), "_bin").agg(
        F.sum("_cnt").alias("_cnt")
    )
    dense = _dense_bins(len(bnd) + 1)
    if group:
        merged = merged_long.groupBy(*group).agg(dense.alias("_bins"))
    else:
        merged = merged_long.agg(dense.alias("_bins"))
    total = F.aggregate(
        "_bins", F.lit(0).cast("long"), lambda acc, c: acc + c
    )
    # boundary list with +inf sentinel so the last bin has an upper edge
    edge = F.lit(np.asarray(list(bnd) + [float("inf")], dtype=np.float64))
    cols = []
    for p in probs:
        # index of the first bin whose cumulative count reaches p*total:
        # fold over bins carrying (cum, chosen_index)
        picked = F.aggregate(
            F.sequence(F.lit(0), F.lit(len(bnd))),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(-1).alias("idx"),
            ),
            lambda acc, i: F.struct(
                (acc["cum"] + F.element_at("_bins", i + 1)).alias("cum"),
                F.when(
                    (acc["idx"] == -1)
                    & (
                        (acc["cum"] + F.element_at("_bins", i + 1))
                        >= F.lit(float(p)) * total
                    ),
                    i,
                )
                .otherwise(acc["idx"])
                .alias("idx"),
            ),
            lambda acc: acc["idx"],
        )
        cols.append(
            F.element_at(edge, picked + 1).alias(f"q_{str(p).replace('.', '_')}")
        )
    return merged.select(*(group or []), *cols)


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable point-frequency table (Cormode &
# Muthukrishnan 2005) — the frequency member of the sketch family
# (Bloom = membership, HLL = distinct, Misra-Gries = top-k,
# KLL/histogram = quantiles, CM = "how often does THIS item occur").
# Misra-Gries answers "which items are heavy"; CM answers point
# queries about ANY item, including ones that never reached the top-k
# report, with a one-sided error: est >= true always, and
# est <= true + e/width * N with probability 1 - e^-depth per query.
# Same economics as the other sketches: per-partition state is capped
# at depth x width counters (map-side partial aggregation), merging
# two sketch tables is counter-wise addition (order-free), so an
# incremental per-day CM table answers arbitrary date-range frequency
# questions without rescanning history.


def cms_sketch_table(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    keys: list[str] | None = None,
) -> DataFrame:
    """Build a CM sketch as a ≤ depth*width-row table (``keys...``, j,
    idx, cnt): row j counts items at idx = xxhash64(item, j) mod width.
    One explode over a depth-length literal array (constant
    fan-out, never data-dependent) + one groupBy — the ONLY shuffle,
    bounded by depth*width rows per upstream partition whatever the
    item cardinality. Optional ``keys`` build one sketch per group
    (e.g. per day) for the incremental pattern."""
    ks = list(keys or [])
    item = F.col(col).cast("string")
    rows = (
        df.filter(item.isNotNull())
        .select(
            *ks,
            item.alias("_it"),
            F.explode(
                F.array(*[F.lit(j) for j in range(int(depth))])
            ).alias("j"),
        )
        .select(
            *ks,
            "j",
            F.pmod(F.xxhash64("_it", "j"), F.lit(int(width))).alias("idx"),
        )
    )
    return rows.groupBy(*ks, "j", "idx").agg(F.count("*").alias("cnt"))


def cms_merge(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Re-aggregate sketch rows (e.g. a date-range selection of per-day
    sketches, or the union of two tables built with the SAME
    depth/width): counter-wise addition, order-free and idempotent-
    shaped like the HLL union above."""
    return sketches.groupBy(*(keys or []), "j", "idx").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query a CM sketch table for every row of ``items``:
    est = min over rows j of counter[j][h_j(item)] (absent counter =
    0). depth/width MUST match the build (they parameterize the hash
    layout; the shared expression keeps build and probe in agreement
    the same way ``_word_and_mask`` does for the Bloom filter). The
    probe explodes items by depth (constant fan-out), joins the sketch
    on (j, idx) — broadcast-eligible: the sketch is ≤ depth*width rows
    — and takes the per-item min. Guarantees: est >= true count
    (always, every row only ever over-counts), est <= true +
    N*e/width with prob 1 - e^-depth."""
    item = F.col(col).cast("string")
    # same null policy as the build side (cms_sketch_table filters
    # null items): a null probe would hash as xxhash64(j) alone and
    # could return a spurious positive for item=NULL
    probes = items.filter(item.isNotNull()).select(
        item.alias("item"),
        F.explode(F.array(*[F.lit(j) for j in range(int(depth))])).alias("j"),
    ).select(
        "item",
        "j",
        F.pmod(F.xxhash64("item", "j"), F.lit(int(width))).alias("idx"),
    )
    # re-aggregate to one counter per (j, idx) first: a KEYED sketch
    # table (per-day rows) passed here whole would otherwise join one
    # row PER KEY and the min would pick the smallest single key's
    # counter — an undercount, violating the one-sided guarantee. For
    # an already-flat sketch this is a no-op-shaped tiny aggregate.
    flat = sketch.groupBy("j", "idx").agg(F.sum("cnt").alias("cnt"))
    return (
        probes.join(F.broadcast(flat), ["j", "idx"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )
