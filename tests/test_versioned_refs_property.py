"""Property-based lifecycle test for the versioned layer's reference
manifests (r9): arbitrary sequences of incremental-style generation
commits (each holding a random subset of partitions physically and
carrying the rest by fully-resolved reference) interleaved with
vacuums at arbitrary retention — after every operation, every
partition the CURRENT manifest references must physically exist, and
the manifest must equal the model the compaction semantics predict.

This is the invariant the scripted tests pin on two fixed topologies
(`test_batchdir.py`), generalized: a vacuum that sweeps or prunes one
holder generation still referenced by ANY retained manifest is data
loss, whatever the ref graph looks like.

Filesystem-only: write_fn fakes data files with `touch`, so each
commit/vacuum is milliseconds — no Spark jobs, just the JVM
filesystem API the real machinery uses.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bda_spark.sources.versioned import (
    _gen_dir,
    commit_generation,
    current_generation,
    generation_manifest,
    vacuum_versions,
    write_generation_refs,
)

PARTS = ["day=d0", "day=d1", "day=d2", "day=d3"]

# an op is either a commit (frozenset of physically-held partition
# names, possibly empty = refs-only carry) or a vacuum keep count
ops_strategy = st.lists(
    st.one_of(
        st.frozensets(st.sampled_from(PARTS), max_size=4).map(
            lambda s: ("commit", s)
        ),
        st.integers(min_value=1, max_value=3).map(lambda k: ("vacuum", k)),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_referenced_partitions_always_exist(spark, ops):
    root = os.path.join(tempfile.mkdtemp(), "t")
    model: dict[str, int] = {}  # name -> physical holder generation

    def check():
        gen = current_generation(spark, root)
        if gen is None:
            return
        manifest, _plain = generation_manifest(spark, root, gen)
        assert manifest == model, (manifest, model)
        for name, holder in manifest.items():
            d = os.path.join(_gen_dir(root, holder), name)
            assert os.path.isdir(d), f"referenced {name}@gen{holder} swept"
            assert os.listdir(d), f"referenced {name}@gen{holder} emptied"

    for kind, arg in ops:
        if kind == "commit":
            physical = sorted(arg)

            def _write(data_dir: str, physical=physical) -> None:
                os.makedirs(data_dir, exist_ok=True)
                for name in physical:
                    d = os.path.join(data_dir, name)
                    os.makedirs(d)
                    with open(os.path.join(d, "part-0.parquet"), "w") as f:
                        f.write("x")
                refs = {
                    n: g for n, g in model.items() if n not in physical
                }
                if refs:
                    write_generation_refs(spark, data_dir, refs)

            gen = commit_generation(spark, root, _write)
            for name in physical:
                model[name] = gen
        else:
            if current_generation(spark, root) is None:
                continue
            vacuum_versions(spark, root, keep=arg, min_age_seconds=0.0)
        check()
