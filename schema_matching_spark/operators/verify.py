"""Final-state equality verifier (SURVEY.md §2.B B9).

Replay of the full change log must reproduce the expected final table
state *bit-for-bit*: per-turn text equality under stable
(conv_id, turn_idx) ordering (BASELINE.json input_hint).

Two checks, both distributed (no driver-side collect of table data):

* symmetric ``exceptAll`` — empty both ways ⇒ multiset equality;
  NULL-safe because exceptAll compares with NULL <=> NULL = true
  semantics at the row level;
* an order-insensitive content hash — sum of per-row xxhash64 over the
  NULL-tagged canonical string encoding — cheap enough to run on every
  bench replay as a guardrail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TRANSCRIPT_COLS


def _canonical(df: DataFrame) -> DataFrame:
    cols = [c for c in TRANSCRIPT_COLS if c in df.columns]
    return df.select(*cols)


def content_hash(df: DataFrame) -> tuple:
    """Order-insensitive table fingerprint.  NULL is tagged distinctly
    from the empty string ('\\x00null' marker) so NULL-vs-'' drift is
    caught (SURVEY.md §7.4)."""
    df = _canonical(df)
    tagged = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
        for c in df.columns
    ]
    # sum as decimal(38,0): int64 sum overflows under ANSI mode at scale
    row_hash = F.xxhash64(*tagged).cast("decimal(38,0)")
    out = df.select(tagged).select(F.sum(row_hash).alias("h"), F.count("*").alias("n"))
    r = out.collect()[0]
    return (str(r["h"]), r["n"])


def states_equal(actual: DataFrame, expected: DataFrame) -> bool:
    """Multiset equality of the two table states."""
    a, e = _canonical(actual), _canonical(expected)
    return a.exceptAll(e).isEmpty() and e.exceptAll(a).isEmpty()


def diff(actual: DataFrame, expected: DataFrame, n: int = 20):
    """Debug helper: rows only in actual / only in expected."""
    a, e = _canonical(actual), _canonical(expected)
    return (
        a.exceptAll(e).limit(n).collect(),
        e.exceptAll(a).limit(n).collect(),
    )
