"""Collector feature extraction unit tests (SURVEY.md §2.A A3-A12).

documents.text (driver testdata) feeds the n-gram/token collectors with
real text-like value distributions per FIXTURES.md §4.
"""

import numpy as np
import pytest

from schema_matching_spark.functions.collectors import (
    D_BIGRAM,
    D_CHAR,
    column_features,
    distance_matrix,
    feature_distance,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_scalar_collectors(spark):
    df = spark.createDataFrame(
        [("aa", 1.0), ("bbbb", 2.0), (None, 3.0)], ["s", "x"]
    )
    feats = column_features(df)
    s, x = feats["s"], feats["x"]
    assert s.n == 2 and s.nulls == 1
    assert s.null_rate == pytest.approx(1 / 3)
    assert s.avg_len == pytest.approx(3.0)
    assert s.numeric_rate == 0.0
    assert x.numeric_rate == 1.0
    assert x.numeric_mean == pytest.approx(2.0)
    assert x.numeric_std == pytest.approx(np.sqrt(2 / 3))


def test_histograms_normalized(docs):
    feats = column_features(docs, ["text", "lang", "source"])
    for f in feats.values():
        assert f.char_hist.shape == (D_CHAR,)
        assert f.char_hist.sum() == pytest.approx(1.0)
        assert f.bigram_hist.sum() == pytest.approx(1.0)
        assert f.token_hist.sum() == pytest.approx(1.0)


def test_features_partition_invariant(docs):
    """Same values, different partitioning ⇒ identical final features
    (determinism requirement, SURVEY.md §7.4)."""
    a = column_features(docs, ["text"], sample_rows=0)
    b = column_features(docs.repartition(13), ["text"], sample_rows=0)
    assert a["text"].n == b["text"].n
    assert a["text"].avg_len == pytest.approx(b["text"].avg_len)
    assert np.allclose(a["text"].char_hist, b["text"].char_hist)
    assert np.allclose(a["text"].bigram_hist, b["text"].bigram_hist)
    assert np.allclose(a["text"].token_hist, b["text"].token_hist)


def test_self_distance_zero_and_symmetry(docs):
    feats = column_features(docs, ["text", "lang"])
    assert feature_distance(feats["text"], feats["text"]) == pytest.approx(0.0)
    d1 = feature_distance(feats["text"], feats["lang"])
    d2 = feature_distance(feats["lang"], feats["text"])
    assert d1 == pytest.approx(d2)
    assert d1 > 0.2  # clearly different columns are clearly distant


def test_distance_matrix_identifies_same_columns(docs):
    """A column is closest to itself across two disjoint samples."""
    half1 = docs.where("doc_id % 2 = 0")
    half2 = docs.where("doc_id % 2 = 1")
    f1 = column_features(half1, ["text", "lang", "source"], sample_rows=0)
    f2 = column_features(half2, ["text", "lang", "source"], sample_rows=0)
    s_cols, t_cols, m = distance_matrix(f1, f2)
    for i, c in enumerate(s_cols):
        j = int(np.argmin(m[i]))
        assert t_cols[j] == c, f"{c} matched {t_cols[j]}"
