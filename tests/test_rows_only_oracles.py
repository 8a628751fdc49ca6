"""Local value mirrors for cdc_replay_state and stateful_progress.

Historically (r1-r4) these were the driver's rows-only queries (input
was the engine-internal generator) and this file was their only exact
evidence; since r5 both derive their input from the events table and
carry full DuckDB oracles in the driver gate — this file keeps the
same equality as a fast local guard (the SAME log persisted to parquet,
expected values in pure DuckDB SQL)."""

import duckdb

from schema_matching_spark.queries import cdc
from schema_matching_spark.sources.generator import with_dup_delivery
from tests.conftest import SF_DIR


def _duck_on(log_path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW log AS SELECT * FROM read_parquet('{log_path}/*.parquet')"
    )
    return con


def test_cdc_replay_state_values_match_pure_sql(spark, tmp_path):
    # identical construction to q_cdc_replay_state (since r5 the input
    # is the events-derived change log, so this doubles as a local
    # mirror of the driver's exact oracle) — plus the dup delivery the
    # SQL must see collapsed
    log = with_dup_delivery(cdc._events_changelog(spark, SF_DIR))
    log_path = str(tmp_path / "log")
    log.write.parquet(log_path)

    expected = _duck_on(log_path).execute("""
        WITH win AS (
          SELECT conv_id, turn_idx, max(lsn) AS lsn FROM log GROUP BY 1, 2
        ), state AS (
          SELECT DISTINCT l.conv_id, l.turn_idx, l.op, l.role
          FROM log l JOIN win USING (conv_id, turn_idx, lsn)
        )
        SELECT role,
               count(*) AS n_turns,
               count(DISTINCT conv_id) AS n_convs,
               max(turn_idx) AS max_turn
        FROM state WHERE op <> 'D'
        GROUP BY role ORDER BY role
    """).fetchall()

    actual = [
        (r["role"], r["n_turns"], r["n_convs"], r["max_turn"])
        for r in cdc.q_cdc_replay_state(spark, SF_DIR).collect()
    ]
    assert actual == [tuple(r) for r in expected]


def test_stateful_progress_values_match_pure_sql(spark, tmp_path):
    # same input as q_stateful_progress (events-derived log since r5 —
    # this doubles as a local mirror of the driver's exact oracle)
    log = cdc._events_changelog(spark, SF_DIR)
    log_path = str(tmp_path / "log")
    log.write.parquet(log_path)

    expected = _duck_on(log_path).execute("""
        SELECT conv_id,
               count(*) AS n_events,
               sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS n_deletes,
               max(lsn) AS max_lsn
        FROM log GROUP BY conv_id ORDER BY conv_id
    """).fetchall()

    actual = [
        (r["conv_id"], r["n_events"], r["n_deletes"], r["max_lsn"])
        for r in cdc.q_stateful_progress(spark, SF_DIR).collect()
    ]
    assert actual == [tuple(r) for r in expected]
