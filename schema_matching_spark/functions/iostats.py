"""Driver-side dataset statistics without Spark jobs.

Parquet footers already carry exact row counts; for sizing decisions
(ANN quantizer width, training-sample fractions) reading them via
pyarrow costs zero jobs and no scan.  Falls back to a Spark count for
filesystems pyarrow can't reach.  Counts are cached per path — sizing
callers are invoked repeatedly against the same corpus.
"""

from __future__ import annotations

_ROWS: dict[str, int] = {}


def parquet_row_count(spark, path: str) -> int:
    if path not in _ROWS:
        try:
            import pyarrow.dataset as ds

            _ROWS[path] = ds.dataset(path).count_rows()
        except Exception:
            _ROWS[path] = spark.read.parquet(path).count()
    return _ROWS[path]
