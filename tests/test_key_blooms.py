"""Per-file conv_id bloom filters + manifest live-row counts
(SURVEY.md §2.B B5/B8 point-read path; Iceberg puffin-stats parity).

``SnapshotTable(key_blooms=True)`` records, per written data file, a
bloom over its distinct conv_ids (in a per-commit sidecar) and a
live-row count in the manifest.  ``lookup()`` then skips bucket files
whose bloom proves the key absent — the win is MOR delta files, where a
conversation touched in 3 of 200 micro-batches reads ~3 deltas instead
of 200 — and ``count()`` answers from metadata on COW (zero jobs).
"""

import os

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.plans.table import (
    SnapshotTable,
    _BLOOM_MAX_NDV,
    _bloom_may_contain,
    _build_key_bloom,
)
from schema_matching_spark.sources.generator import changes


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- unit


def test_bloom_no_false_negatives_and_low_fpp():
    keys = [f"conv-{i:08d}" for i in range(5000)]
    bloom = _build_key_bloom(keys)
    assert all(_bloom_may_contain(bloom, k) for k in keys)  # hard bound
    misses = [f"other-{i:08d}" for i in range(5000)]
    fp = sum(_bloom_may_contain(bloom, k) for k in misses)
    assert fp / len(misses) < 0.03  # ~1% design fpp, 3× slack


def test_bloom_ndv_cap_returns_none():
    assert _build_key_bloom([]) is None
    assert _build_key_bloom(["k"] * 1)  # tiny ok
    big = [str(i) for i in range(_BLOOM_MAX_NDV + 1)]
    assert _build_key_bloom(big) is None


# ------------------------------------------------------------- lookup


def _mor_with_deltas(spark, path):
    """MOR table, 1 bucket (so bloom skipping is the ONLY pruning):
    one broad base batch over 20 conversations, then 4 delta batches
    each touching only conv-00000003."""
    t = SnapshotTable(spark, path, n_buckets=1, mode="mor", key_blooms=True)
    apply_batch(t, changes(spark, 2000, n_conv=20, partitions=2), "b0")
    for i in range(1, 5):
        delta = changes(
            spark, 400, n_conv=20, lsn_start=10_000 * i, partitions=2
        ).where("conv_id = 'conv-00000003'")
        apply_batch(t, delta, f"b{i}")
    return t


def test_lookup_skips_bloom_negative_delta_files(spark, tmp_path):
    t = _mor_with_deltas(spark, str(tmp_path / "t"))
    plain = SnapshotTable(spark, str(tmp_path / "p"), n_buckets=1, mode="mor")
    apply_batch(plain, changes(spark, 2000, n_conv=20, partitions=2), "b0")
    for i in range(1, 5):
        delta = changes(
            spark, 400, n_conv=20, lsn_start=10_000 * i, partitions=2
        ).where("conv_id = 'conv-00000003'")
        apply_batch(plain, delta, f"b{i}")

    # a conversation absent from every delta: blooms must skip the
    # delta files, and the answer must equal the bloom-less table's
    got = t.lookup("conv-00000005")
    assert _rows(got) == _rows(plain.lookup("conv-00000005"))
    s = t.last_lookup_stats
    assert s["files_read"] < s["files_in_bucket"]
    # the 4 deltas are conv-3-only; with ~1% fpp at most one may leak
    assert s["files_in_bucket"] - s["files_read"] >= 3

    # the hot conversation itself: deltas must NOT be skipped (no
    # false negatives) and the LWW answer stays exact
    assert _rows(t.lookup("conv-00000003")) == _rows(
        plain.lookup("conv-00000003")
    )

    # the plain table reads every bucket file
    plain.lookup("conv-00000005")
    ps = plain.last_lookup_stats
    assert ps["files_read"] == ps["files_in_bucket"]


def test_lookup_equality_all_keys_cow(spark, tmp_path):
    log = changes(spark, 3000, n_conv=12, partitions=4)
    t = SnapshotTable(
        spark, str(tmp_path / "t"), n_buckets=4, mode="cow", key_blooms=True
    )
    p = SnapshotTable(spark, str(tmp_path / "p"), n_buckets=4, mode="cow")
    apply_batch(t, log, "b0")
    apply_batch(p, log, "b0")
    for i in range(12):
        k = f"conv-{i:08d}"
        assert _rows(t.lookup(k)) == _rows(p.lookup(k)), k


# -------------------------------------------------------------- count


def test_count_from_metadata_on_cow(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), n_buckets=4, mode="cow", key_blooms=True
    )
    # generator op mix includes deletes -> files carry tombstones, so
    # rows_live must subtract them
    apply_batch(t, changes(spark, 3000, n_conv=15, partitions=4), "b0")
    apply_batch(
        t, changes(spark, 1000, n_conv=15, lsn_start=5000, partitions=2), "b1"
    )
    expect = t.read().count()
    assert t.count() == expect
    assert t.last_count_source == "metadata"
    # time-travel count also metadata-answered
    v1 = t.current_version() - 1
    assert t.count(v1) == t.read(v1).count()


def test_count_falls_back_to_scan_on_mor(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), n_buckets=2, mode="mor", key_blooms=True
    )
    apply_batch(t, changes(spark, 2000, n_conv=10, partitions=2), "b0")
    apply_batch(
        t, changes(spark, 500, n_conv=10, lsn_start=9000, partitions=2), "b1"
    )
    # MOR deltas shadow base versions of a key: per-file live counts
    # overcount, so the metadata path must refuse
    assert t.count() == t.read().count()
    assert t.last_count_source == "scan"


def test_count_falls_back_without_stats(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="cow")
    apply_batch(t, changes(spark, 1000, n_conv=8, partitions=2), "b0")
    assert t.count() == t.read().count()
    assert t.last_count_source == "scan"


# ------------------------------------------- persistence + lifecycle


def test_key_blooms_setting_persists_in_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, n_buckets=2, mode="cow", key_blooms=True)
    apply_batch(t, changes(spark, 800, n_conv=8, partitions=2), "b0")
    # reopen WITHOUT the flag: manifest setting wins (like `mode`)
    t2 = SnapshotTable(spark, path, n_buckets=2)
    apply_batch(t2, changes(spark, 400, n_conv=8, lsn_start=2000, partitions=2), "b1")
    m = t2.manifest()
    assert m["key_blooms"] is True
    assert all("rows_live" in f for f in m["files"])
    assert t2.count() == t2.read().count()
    assert t2.last_count_source == "metadata"


def test_expire_snapshots_keeps_live_sidecars_drops_orphans(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), n_buckets=1, mode="mor", key_blooms=True
    )
    for i in range(6):
        apply_batch(
            t,
            changes(spark, 300, n_conv=10, lsn_start=1000 * i, partitions=2),
            f"b{i}",
        )
    t.compact()  # rewrites -> older commits become orphanable
    expect = _rows(t.read())
    t.expire_snapshots(keep_n=1)
    # retained manifest's sidecars still exist; lookups stay correct
    m = t.manifest()
    for f in m["files"]:
        if "bloom_sidecar" in f:
            assert os.path.exists(f["bloom_sidecar"])
    assert _rows(t.read()) == expect
    assert _rows(t.lookup("conv-00000004")) == [
        r for r in expect if r[0] == "conv-00000004"
    ]
    # orphaned commit dirs (incl. their sidecars) are fully gone
    data_root = os.path.join(str(tmp_path / "t"), "data")
    live_dirs = {
        os.path.basename(os.path.dirname(os.path.dirname(f["path"])))
        for f in m["files"]
    }
    for commit_id in os.listdir(data_root):
        assert commit_id in live_dirs
