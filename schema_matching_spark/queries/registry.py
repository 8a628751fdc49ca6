"""Aggregates every query-pack module into the driver contract
(__spark_entry__.queries / oracle_sql)."""

from __future__ import annotations

from . import (
    cdc,
    dataprep,
    multimodal_q,
    python_udfs,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    similarity,
    sources_q,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    cdc,
    dataprep,
    similarity,
    multimodal_q,
    sources_q,
    python_udfs,
]


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
