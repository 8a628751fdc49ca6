"""Text-analysis and dedup primitives for training-data pipelines.

All hot-path computation is JVM-side (built-in functions, higher-order
array ops) or Arrow-batched numpy — never per-row Python.  Hashes are
xxhash64/md5/crc32 (deterministic), never Python hash().

Operators (driver brief: first-class alongside SURVEY.md §2):
* tokenization + token counting (whitespace and BPE-ish regex)
* quality scoring (length / punctuation / stopword ratios)
* language-ID (char n-gram profile heuristic)
* document fingerprinting (md5 + rolling polynomial hash)
* MinHash signatures + LSH banding for near-dup candidate pairs
* SimHash (64-bit) + Hamming-band near-dup candidates
* exact n-gram Jaccard verification
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# ----------------------------------------------------------------- tokens


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text (JVM split, no Python)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: runs of alphanumerics and individual
    punctuation marks each count as one token (RE2-safe pattern so the
    DuckDB oracle can mirror it exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))


# ---------------------------------------------------------------- quality


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio features, all JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    length = F.length(c)
    n_punct = length - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    toks = tokens_col(c)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    return {
        "n_chars": length,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct / F.greatest(length, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6),
        "avg_token_len": F.round(length / F.greatest(n_tokens, F.lit(1)), 6),
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation
    soup, some-but-not-all stopwords."""
    f = quality_features(text)
    len_score = F.least(f["n_tokens"] / F.lit(50.0), F.lit(1.0))
    punct_score = 1 - F.least(f["punct_ratio"] * 5, F.lit(1.0))
    stop_score = 1 - F.abs(f["stopword_ratio"] - 0.4) / F.lit(0.6)
    return F.round((len_score + punct_score + F.greatest(stop_score, F.lit(0.0))) / 3, 6)


# ------------------------------------------------------------ fingerprints


def md5_fingerprint(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(c)))


def rolling_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Rolling polynomial hash: min over sliding token windows of
    xxhash64(window-join) — a winnowing-style document fingerprint that
    is robust to content shifts.  Pure higher-order JVM expressions."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    window_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window)))
    )
    return F.array_min(window_hashes)


# ------------------------------------------------------------------ shingles


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams (shingles) of the text, JVM-side:
    sequence over start offsets + substring transform."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: F.substring(c, i, F.lit(k))))


def token_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct token n-grams."""
    toks = tokens_col(text)
    cnt = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(cnt - n + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


# ------------------------------------------------------------------- minhash


def minhash_signature(shingles: Column, n_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(shingle, i).  One array column, all JVM-side."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(n_hashes)
        ]
    )


def lsh_band_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    n_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Scale path: explode to (band, bucket-hash, id) — the shuffle key is
    the banded bucket, so candidates co-locate and the join is
    band-local; no O(n^2) comparison ever happens.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


# ------------------------------------------------------------------- simhash


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash from shingle hashes, fully JVM-side.

    For each bit b: sum over shingles of ±1 by bit b of xxhash64(s);
    bit set iff sum > 0.  aggregate() folds the ±1 sums per bit.
    """
    def vote(b: int) -> Column:
        # NB: b must be bound via this closure, not a lambda default arg —
        # pyspark inspects higher-order lambda arity and a 3-arg lambda
        # is mis-dispatched.
        return F.aggregate(
            shingles,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(F.shiftright(F.xxhash64(s), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1),
        )

    # sum of disjoint bit values; 2^63 would overflow signed — use bits 0..62
    bits = [
        F.when(vote(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(63)
    ]
    return sum(bits, F.lit(0).cast("long"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
