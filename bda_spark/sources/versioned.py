"""Reader-atomic table generations: the pointer-indirection layout that
lets maintenance (compaction, re-clustering) rewrite a table while
concurrent readers never observe a missing or partial table.

The plain-dir swap in ``layout.optimize_table`` (move live aside, move
new in) has an unavoidable window between the two renames where a
reader listing the path sees NO table. Versioned layout removes the
window entirely with the log-commit trick Delta/Iceberg use, built from
two filesystem primitives that ARE atomic everywhere (HDFS, S3A with
consistent listing, local):

    root/_versions/gen-00000007/   <- immutable parquet data dirs
    root/_commits/00000007         <- empty marker; CREATE is atomic

A writer prepares generation N+1 fully under ``_versions`` (invisible:
readers never list that dir speculatively), then atomically creates the
commit marker. Readers resolve max(_commits) -> one generation dir and
scan only it; they see generation N until the instant the marker
appears, N+1 after — never a mix, never nothing. A crash before the
marker leaves unreferenced debris that the next writer deletes; no heal
rename is ever needed because the live table was never touched.

``vacuum_versions(keep=2)`` bounds storage: the previous generation is
retained one maintenance cycle so an in-flight reader that resolved it
just before a commit can finish its scan (the same grace-period
contract as Delta's VACUUM retention).

At 100 TB this also makes the swap O(1): committing is one empty-file
create regardless of table size, where the rename swap was already
O(1) per dir but with the non-atomic two-step.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sinks import _hadoop_path

VERSIONS_DIR = "_versions"
COMMITS_DIR = "_commits"


def _gen_dir(root: str, gen: int) -> str:
    return f"{root.rstrip('/')}/{VERSIONS_DIR}/gen-{gen:08d}"


def current_generation(spark: SparkSession, root: str) -> int | None:
    """Highest committed generation number, or None for a non-versioned
    path. One small-dir listing — the only metadata a reader pays."""
    fs, commits = _hadoop_path(spark, f"{root.rstrip('/')}/{COMMITS_DIR}")
    if not fs.exists(commits):
        return None
    best = None
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if name.isdigit():
            n = int(name)
            if best is None or n > best:
                best = n
    return best


def is_versioned(spark: SparkSession, root: str) -> bool:
    return current_generation(spark, root) is not None


def resolve_table(
    spark: SparkSession, root: str, generation: int | None = None
) -> str:
    """The path a reader should scan: the current generation dir for a
    versioned root, the root itself for a plain parquet dir (so callers
    can resolve unconditionally). Pass ``generation`` for TIME TRAVEL —
    reading a specific committed generation that vacuum hasn't swept
    yet (the same as-of contract as Delta's VERSION AS OF, bounded by
    the vacuum retention)."""
    if generation is not None:
        fs, marker = _hadoop_path(
            spark, f"{root.rstrip('/')}/{COMMITS_DIR}/{int(generation):08d}"
        )
        _, data_p = _hadoop_path(spark, _gen_dir(root, int(generation)))
        if not fs.exists(marker) or not fs.exists(data_p):
            raise FileNotFoundError(
                f"generation {generation} of {root} is not available "
                f"(never committed, or swept by vacuum_versions)"
            )
        return _gen_dir(root, int(generation))
    gen = current_generation(spark, root)
    return root if gen is None else _gen_dir(root, gen)


def read_versioned(
    spark: SparkSession, root: str, generation: int | None = None
) -> DataFrame:
    return spark.read.parquet(resolve_table(spark, root, generation))


def commit_generation(
    spark: SparkSession,
    root: str,
    write_fn: Callable[[str], None],
) -> int:
    """Publish a new generation: ``write_fn(data_path)`` must fully
    write the generation's parquet under ``data_path``; the commit
    marker is created only after it returns, so readers can never
    resolve a partially-written generation. Returns the new generation
    number.

    Concurrency protocol: each attempt first CLAIMS a generation slot
    by atomically creating ``gen-N.lock`` (skipping slots other
    writers — live or crashed — already claimed), so no two writers
    ever touch the same data dir and a committed generation can never
    be deleted or replaced by a racing attempt. Before publishing, the
    attempt re-checks that no higher generation committed since it
    read its base and aborts with an IOError instead of silently
    publishing a result that lost the concurrent update (callers
    retry against the new current generation — the optimistic-commit
    discipline; full serialization of concurrent mergers still needs
    an external scheduler, as with any log-less table format).

    Crash-safe with no recovery step: an attempt that dies before its
    marker leaves only a claimed-but-uncommitted slot (lock + debris
    dir) that readers never resolve and ``vacuum_versions`` sweeps."""
    base = root.rstrip("/")
    cur = current_generation(spark, root)
    fs, versions_p = _hadoop_path(spark, f"{base}/{VERSIONS_DIR}")
    fs.mkdirs(versions_p)
    nxt = 1 if cur is None else cur + 1
    while True:
        _, lock = _hadoop_path(
            spark, f"{base}/{VERSIONS_DIR}/gen-{nxt:08d}.lock"
        )
        if fs.createNewFile(lock):
            break
        nxt += 1  # slot claimed by another (possibly crashed) writer
    data = _gen_dir(root, nxt)
    _, data_p = _hadoop_path(spark, data)
    # the lock makes this slot exclusively ours, and committed slots
    # are never re-claimed (the scan starts above the current marker),
    # so anything already in the dir is uncommitted debris — e.g. from
    # a crashed pre-lock-protocol writer — and safe to clear
    fs.delete(data_p, True)
    write_fn(data)
    latest = current_generation(spark, root)
    if latest is not None and (cur is None or latest > cur):
        fs.delete(data_p, True)
        fs.delete(lock, False)
        raise IOError(
            f"commit_generation: generation {latest} committed under "
            f"{root} while this attempt (base {cur}) was writing — "
            f"aborted to avoid publishing a lost update; rerun against "
            f"the new current generation"
        )
    _, commits_p = _hadoop_path(spark, f"{base}/{COMMITS_DIR}")
    fs.mkdirs(commits_p)
    _, marker = _hadoop_path(spark, f"{base}/{COMMITS_DIR}/{nxt:08d}")
    if not fs.createNewFile(marker):
        raise IOError(
            f"commit_generation: marker {nxt:08d} already exists under "
            f"{root} despite the slot lock — manual intervention needed"
        )
    return nxt


def vacuum_versions(spark: SparkSession, root: str, keep: int = 2) -> int:
    """Delete generation data (and markers/slot locks) older than the
    newest ``keep`` COMMITTED generations. ``keep >= 2`` leaves the
    previous committed generation alive for one maintenance cycle so
    in-flight readers finish; never pass 1 unless no reader can be
    concurrent. The retention is counted over COMMITTED generations,
    not generation numbers — aborted/crashed attempts leave number
    gaps, and arithmetic on the max number would sweep the previous
    committed generation right through such a gap. Unreferenced debris
    in the swept range is removed too. Returns the number of data dirs
    deleted."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    base = root.rstrip("/")
    fs, commits_p = _hadoop_path(spark, f"{base}/{COMMITS_DIR}")
    if not fs.exists(commits_p):
        return 0
    committed = sorted(
        int(st.getPath().getName())
        for st in fs.listStatus(commits_p)
        if st.getPath().getName().isdigit()
    )
    if not committed:
        return 0
    retained = committed[-keep:]
    cutoff = min(retained)  # delete anything numbered below this
    fs, versions_p = _hadoop_path(spark, f"{base}/{VERSIONS_DIR}")
    removed = 0
    if fs.exists(versions_p):
        for st in fs.listStatus(versions_p):
            name = st.getPath().getName()
            num = name[4:-5] if name.endswith(".lock") else name[4:]
            if name.startswith("gen-") and num.isdigit():
                if int(num) < cutoff:
                    fs.delete(st.getPath(), True)
                    if not name.endswith(".lock"):
                        removed += 1
    for st in fs.listStatus(commits_p):
        name = st.getPath().getName()
        if name.isdigit() and int(name) < cutoff:
            fs.delete(st.getPath(), False)
    return removed


def to_versioned(spark: SparkSession, path: str) -> int:
    """One-time, OFFLINE migration of a plain parquet dir into the
    versioned layout: its files move into generation 1 and the marker
    commits. After this, ``read_versioned``/``resolve_table`` readers
    get atomic maintenance forever. The migration itself is the last
    non-atomic moment in the table's life — run it without concurrent
    readers (a rename-per-file window exists only here)."""
    base = path.rstrip("/")
    fs, root_p = _hadoop_path(spark, base)
    if not fs.exists(root_p):
        raise FileNotFoundError(f"to_versioned: no table at {path}")
    if is_versioned(spark, base):
        raise ValueError(f"to_versioned: {path} is already versioned")
    data = _gen_dir(base, 1)
    fs, data_p = _hadoop_path(spark, data)
    fs.mkdirs(data_p)
    jvm = spark._jvm
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if name in (VERSIONS_DIR, COMMITS_DIR):
            continue
        dest = jvm.org.apache.hadoop.fs.Path(f"{data}/{name}")
        if not fs.rename(st.getPath(), dest):
            raise IOError(f"to_versioned: could not move {name} into {data}")
    _, commits_p = _hadoop_path(spark, f"{base}/{COMMITS_DIR}")
    fs.mkdirs(commits_p)
    _, marker = _hadoop_path(spark, f"{base}/{COMMITS_DIR}/{1:08d}")
    if not fs.createNewFile(marker):
        raise IOError(f"to_versioned: commit marker creation failed at {path}")
    return 1
