"""Streaming incremental dedup: match a LIVE document stream against a
persisted MinHash signature index, and grow the index with each
micro-batch — the production loop a corpus ingest runs (the batch twin
is ``operators.dedup.minhash_index`` / ``minhash_match_new``; this
wires it into Structured Streaming's foreachBatch).

Per micro-batch:
  1. signatures of the batch are computed once (one shingle pass over
     the batch only — the corpus is NEVER re-shingled),
  2. the batch is banded against the CURRENT index (pass
     ``max_bucket_size`` to cap hot corpus posting lists; with
     ``cap_mode="chained"`` the cap is RECALL-SAFE for near-identical
     hot clusters — see ``minhash_match_new`` and the
     ``minhash_bucket_truncation`` exposure audit) and flagged matches
     land in ``flags_path``,
  3. the batch's signatures merge into ``index_path`` so LATER batches
     dedup against everything seen so far.

Both writes go through ``idempotent_merge_parquet`` keyed by document
id, so a replayed micro-batch (foreachBatch is at-least-once after a
failure) upserts instead of duplicating — the restart-safety contract
the rest of the streaming layer follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import minhash_index, minhash_match_new
from ..sources.batch import read_parquet
from ..sources.sinks import _hadoop_path, idempotent_merge_parquet
from ..sources.versioned import is_versioned


def stream_dedup_against_index(
    stream_docs: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 64,
    band_rows: int = 2,
    seed: int = 42,
    available_now: bool = False,
    max_bucket_size: int | None = None,
    cap_mode: str = "chained",
    vacuum_min_age_seconds: float = 60.0,
):
    """Start the incremental-dedup stream over ``stream_docs`` (a
    streaming DataFrame carrying ``id_col`` + ``text_col``). Returns
    the StreamingQuery. ``index_path`` may start empty (first batch
    bootstraps it) or point at a corpus-built ``minhash_index``.

    Ordering note: batches are processed serially by the engine, so
    "earlier batch" is well-defined; duplicates WITHIN one micro-batch
    are not flagged against each other (they all match the pre-batch
    index only) — run the batch ``dedup_corpus`` on the landed corpus
    for intra-batch collapse, or keep micro-batches small enough that
    intra-batch dups are rare."""
    spark = stream_docs.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        # an at-least-once source can deliver the same doc twice WITHIN
        # one micro-batch; the keyed merge dedups only against rows
        # already in the table, so duplicate ids must collapse here or
        # they'd sit in the index (and fan out candidate pairs) forever
        batch = batch.select(id_col, text_col).dropDuplicates([id_col])
        sigs = minhash_index(
            batch, id_col, text_col, ngram, num_hashes, seed
        ).localCheckpoint(eager=True)
        fs, index_p = _hadoop_path(spark, index_path)
        if is_versioned(spark, index_path) or fs.exists(index_p):
            # read_parquet resolves versioned roots (a migrated index
            # keeps working); a raw spark.read.parquet would see only
            # the underscore-prefixed generation dirs and fail
            index = read_parquet(spark, index_path)
            # redelivery guard: a doc whose id is ALREADY indexed was
            # processed by an earlier (possibly crashed) attempt — it
            # must not be re-flagged against itself or against
            # near-dups that arrived after it. Only genuinely-new ids
            # are matched; the signature merge below is a keyed upsert
            # either way.
            fresh = sigs.join(index.select("doc_id"), "doc_id", "left_anti")
            flags = minhash_match_new(
                batch,
                index,
                threshold=threshold,
                id_col=id_col,
                text_col=text_col,
                ngram=ngram,
                num_hashes=num_hashes,
                band_rows=band_rows,
                seed=seed,
                max_bucket_size=max_bucket_size,
                new_sigs=fresh,
                cap_mode=cap_mode,
            )
            idempotent_merge_parquet(
                spark, flags, flags_path, keys=["new_id", "corpus_id"],
                vacuum_min_age_seconds=vacuum_min_age_seconds,
            )
        # vacuum grace on a VERSIONED index is a storage trade: each
        # micro-batch merge commits a full new generation, so the
        # retained-copy count is (grace / trigger-period). The module's
        # 10-min maintenance default would hold ~600 full index copies
        # at a 1 s trigger; this sink defaults to 60 s — longer than
        # any sane scan of a micro-batch-merged table, bounded at ~60
        # retained copies worst-case — and exposes the knob for slow
        # dashboard readers (raise it) or offline runs (0.0)
        idempotent_merge_parquet(
            spark, sigs, index_path, keys=["doc_id"],
            vacuum_min_age_seconds=vacuum_min_age_seconds,
        )

    writer = (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_semantic_dedup_against_index(
    stream_embeddings: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    n_probe: int = 1,
    n_centroids: int = 64,
    seed: int = 42,
    available_now: bool = False,
    vacuum_min_age_seconds: float = 60.0,
):
    """The SemDeDup twin of ``stream_dedup_against_index``: match each
    micro-batch of (vec_id, embedding) against the persisted
    ``semantic_index_build`` artifact, land (new_id, corpus_id,
    cosine) flags, then upsert the batch into the index so LATER
    batches dedup against everything seen. Same restart-safety
    contract: both writes are keyed idempotent merges, already-indexed
    ids are filtered before matching (a replayed batch re-flags
    nothing), duplicates within one micro-batch collapse by id.

    Bootstrap: a missing index trains centroids on the FIRST batch
    (production pre-builds from the landed corpus instead — a batch-
    sized sample prices cells exactly like the sample-trained IVF
    fit, but a skewed first batch starts skewed). Drift: the append
    reports cell-size skew; when ``needs_retrain`` fires this sink
    keeps going — within-cell matching stays correct, only hot-cell
    read cost degrades — and the CALLER schedules the off-peak
    ``semantic_index_build`` rebuild, the same division of labor as
    ``ivf_sq8_index_append``."""
    from ..operators.similarity import (
        semantic_index_append,
        semantic_index_build,
        semantic_match_new,
    )

    spark = stream_embeddings.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("vec_id", "embedding").dropDuplicates(
            ["vec_id"]
        )
        fs, cells_p = _hadoop_path(spark, f"{index_path.rstrip('/')}/cells")
        if not fs.exists(cells_p):
            semantic_index_build(
                batch, index_path, n_centroids=n_centroids, seed=seed
            )
            return
        indexed = read_parquet(
            spark, f"{index_path.rstrip('/')}/cells"
        ).select("vec_id")
        fresh = batch.join(indexed, "vec_id", "left_anti").localCheckpoint(
            eager=True
        )
        flags = semantic_match_new(
            spark, index_path, fresh, threshold=threshold, n_probe=n_probe
        )
        idempotent_merge_parquet(
            spark,
            flags,
            flags_path,
            keys=["new_id", "corpus_id"],
            vacuum_min_age_seconds=vacuum_min_age_seconds,
        )
        semantic_index_append(spark, index_path, fresh)

    writer = (
        stream_embeddings.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
