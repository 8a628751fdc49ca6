"""Per-column value-distribution collectors (SURVEY.md §2.A A3-A12).

This is the organ lifted from the reference's value-similarity schema
matcher — the public ``davidfoerster/schema-matching`` project computes
per-column feature collectors (item count, letter count/average,
numeric average/variance, relative character frequency; its
collector/*.py modules) in a multi-phase streaming pass and compares
columns by weighted normalized distance (its collector/description.py).
Re-architecture here (NOT a port — reference checkout is empty, see
SURVEY.md §0): one distributed ``mapInPandas`` pass produces per-Arrow-
batch *partial* feature rows (vectorized numpy inside — no per-row
Python API), and the tiny partials (n_partitions × n_columns rows) are
reduced driver-side with numpy.  Spark's partial+final aggregation
replaces the reference's MultiPhaseCollector phasing entirely
(variance via sum/sumsq in one pass).

Hash determinism: all hashing is zlib.crc32 over UTF-8 bytes — Python's
builtin ``hash()`` is process-salted and would break cross-run and
cross-cluster-size reproducibility (SURVEY.md §7.4).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: hashed histogram widths (fixed so vectors are comparable everywhere)
D_CHAR = 128
D_BIGRAM = 256
D_TOKEN = 256

_SEP = "\x00"

_PARTIAL_SCHEMA = StructType(
    [
        StructField("col", StringType(), False),
        StructField("n", LongType(), False),
        StructField("nulls", LongType(), False),
        StructField("len_sum", DoubleType(), False),
        StructField("len_sumsq", DoubleType(), False),
        StructField("num_cnt", LongType(), False),
        StructField("num_sum", DoubleType(), False),
        StructField("num_sumsq", DoubleType(), False),
        StructField("char_hist", ArrayType(DoubleType()), False),
        StructField("bigram_hist", ArrayType(DoubleType()), False),
        StructField("token_hist", ArrayType(DoubleType()), False),
    ]
)


def _string_codes(values: pd.Series) -> np.ndarray:
    """Code-point array of all values joined with a NUL separator —
    one vectorized decode, no per-char Python loop."""
    joined = _SEP.join(values.tolist())
    return np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)


def _partials_for_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for col in pdf.columns:
        s = pdf[col]
        nulls = int(s.isna().sum())
        vals = s.dropna().astype(str)
        n = len(vals)
        if n == 0:
            rows.append(
                (col, 0, nulls, 0.0, 0.0, 0, 0.0, 0.0,
                 [0.0] * D_CHAR, [0.0] * D_BIGRAM, [0.0] * D_TOKEN)
            )
            continue
        lens = vals.str.len().to_numpy(dtype=np.float64)
        nums = pd.to_numeric(vals, errors="coerce")
        num_mask = nums.notna()
        nv = nums[num_mask].to_numpy(dtype=np.float64)

        codes = _string_codes(vals)
        nonsep = codes != 0
        char_hist = np.bincount(
            (codes[nonsep] * np.uint32(2654435761)) % D_CHAR, minlength=D_CHAR
        ).astype(np.float64)
        a, b = codes[:-1], codes[1:]
        bmask = (a != 0) & (b != 0)
        bigram_hist = np.bincount(
            ((a[bmask] * np.uint32(31) + b[bmask]) * np.uint32(2654435761)) % D_BIGRAM,
            minlength=D_BIGRAM,
        ).astype(np.float64)
        token_hist = np.zeros(D_TOKEN, dtype=np.float64)
        for tok in " ".join(vals.tolist()).split():
            token_hist[zlib.crc32(tok.encode()) % D_TOKEN] += 1.0

        rows.append(
            (
                col, n, nulls,
                float(lens.sum()), float((lens * lens).sum()),
                int(num_mask.sum()), float(nv.sum()), float((nv * nv).sum()),
                char_hist.tolist(), bigram_hist.tolist(), token_hist.tolist(),
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in _PARTIAL_SCHEMA.fields])


@dataclass
class ColumnFeatures:
    """Reduced (final) feature vector for one column."""

    n: int = 0
    nulls: int = 0
    null_rate: float = 0.0
    avg_len: float = 0.0
    std_len: float = 0.0
    numeric_rate: float = 0.0
    numeric_mean: float = 0.0
    numeric_std: float = 0.0
    char_hist: np.ndarray = field(default_factory=lambda: np.zeros(D_CHAR))
    bigram_hist: np.ndarray = field(default_factory=lambda: np.zeros(D_BIGRAM))
    token_hist: np.ndarray = field(default_factory=lambda: np.zeros(D_TOKEN))


def _reduce_partials(pdf: pd.DataFrame) -> dict[str, ColumnFeatures]:
    out: dict[str, ColumnFeatures] = {}
    for col, g in pdf.groupby("col"):
        n = int(g["n"].sum())
        nulls = int(g["nulls"].sum())
        f = ColumnFeatures(n=n, nulls=nulls)
        f.null_rate = nulls / max(n + nulls, 1)
        if n > 0:
            ls, lss = g["len_sum"].sum(), g["len_sumsq"].sum()
            f.avg_len = ls / n
            f.std_len = float(np.sqrt(max(lss / n - f.avg_len**2, 0.0)))
            nc = int(g["num_cnt"].sum())
            f.numeric_rate = nc / n
            if nc > 0:
                ns, nss = g["num_sum"].sum(), g["num_sumsq"].sum()
                f.numeric_mean = ns / nc
                f.numeric_std = float(np.sqrt(max(nss / nc - f.numeric_mean**2, 0.0)))
        for name in ("char_hist", "bigram_hist", "token_hist"):
            h = np.sum(np.stack(g[name].to_list()), axis=0)
            tot = h.sum()
            setattr(f, name, h / tot if tot > 0 else h)
        out[str(col)] = f
    return out


def column_features(
    df: DataFrame, columns: list[str] | None = None, sample_rows: int = 20000
) -> dict[str, ColumnFeatures]:
    """Compute final feature vectors for ``columns`` of ``df``.

    Matching needs a representative sample, not the full table — a
    bounded ``limit`` keeps the matcher O(sample) regardless of table
    size (at 100 TB you never scan the table to decide a rename).
    All columns are canonicalized to their string form first so a
    retyped column (int ↔ string digits) compares in the same space.
    """
    cols = columns or df.columns
    projected = df.select([F.col(c).cast("string").alias(c) for c in cols])
    if sample_rows:
        projected = projected.limit(sample_rows)
    partials = projected.mapInPandas(
        lambda it: (_partials_for_batch(pdf) for pdf in it), schema=_PARTIAL_SCHEMA
    )
    return _reduce_partials(partials.toPandas())


# ------------------------------------------------------------------ distance

#: collector weights (reference: collector/weight.py idea — per-collector
#: weights summed over normalized per-feature distances).
DEFAULT_WEIGHTS = {
    "null_rate": 0.5,
    "numeric_rate": 1.5,
    "avg_len": 1.0,
    "std_len": 0.5,
    "numeric_mean": 1.0,
    "numeric_std": 0.5,
    "char_hist": 2.0,
    "bigram_hist": 2.0,
    "token_hist": 1.0,
}


def _rel(a: float, b: float) -> float:
    m = max(abs(a), abs(b))
    return abs(a - b) / m if m > 1e-12 else 0.0


def feature_distance(
    a: ColumnFeatures, b: ColumnFeatures, weights: dict[str, float] | None = None
) -> float:
    """Weighted normalized distance in [0, 1] between two columns."""
    w = weights or DEFAULT_WEIGHTS
    parts = {
        "null_rate": abs(a.null_rate - b.null_rate),
        "numeric_rate": abs(a.numeric_rate - b.numeric_rate),
        "avg_len": _rel(a.avg_len, b.avg_len),
        "std_len": _rel(a.std_len, b.std_len),
        "numeric_mean": _rel(a.numeric_mean, b.numeric_mean),
        "numeric_std": _rel(a.numeric_std, b.numeric_std),
        # L1/2 of normalized histograms is total-variation distance ∈ [0,1]
        "char_hist": float(np.abs(a.char_hist - b.char_hist).sum()) / 2.0,
        "bigram_hist": float(np.abs(a.bigram_hist - b.bigram_hist).sum()) / 2.0,
        "token_hist": float(np.abs(a.token_hist - b.token_hist).sum()) / 2.0,
    }
    total_w = sum(w.values())
    return sum(w[k] * v for k, v in parts.items()) / total_w


def distance_matrix(
    src: dict[str, ColumnFeatures],
    tgt: dict[str, ColumnFeatures],
    weights: dict[str, float] | None = None,
) -> tuple[list[str], list[str], np.ndarray]:
    """K_src × K_tgt weighted distance matrix (reference: description.py
    result-norm idea).  K is tens at most — pure numpy on the driver."""
    s_cols, t_cols = sorted(src), sorted(tgt)
    m = np.zeros((len(s_cols), len(t_cols)))
    for i, sc in enumerate(s_cols):
        for j, tc in enumerate(t_cols):
            m[i, j] = feature_distance(src[sc], tgt[tc], weights)
    return s_cols, t_cols, m
