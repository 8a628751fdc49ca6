"""Iceberg sink adapter gating (plans/iceberg_sink.py): no Iceberg jar
in this sandbox, so availability must report False and the merge must
fail actionably — while the mergeInto API surface it targets exists."""

import pytest

from schema_matching_spark.plans.iceberg_sink import (
    IcebergUnavailableError,
    iceberg_available,
    merge_into_iceberg,
)
from schema_matching_spark.sources.generator import changes


def test_unavailable_without_catalog(spark):
    assert iceberg_available(spark) is False


def test_merge_raises_actionable_error(spark):
    log = changes(spark, 100, n_conv=5, turns_per_conv=5, partitions=1)
    with pytest.raises(IcebergUnavailableError, match="iceberg-spark-runtime"):
        merge_into_iceberg(spark, "db.transcripts", log)


def test_mergeinto_api_present(spark):
    """The swap target (DataFrame.mergeInto) exists in this PySpark."""
    log = changes(spark, 10, n_conv=2, turns_per_conv=2, partitions=1)
    assert hasattr(log, "mergeInto")
