"""Pin the streaming near-dup DuckDB oracle against the live operator.

`_streaming_neardup_oracle_sql` replays streaming_minhash_neardup's
bucket state machine with a recursive CTE. The driver's correctness
gate exercises it at sf0.01 and the local sweep at sf0.1 — but at
those scales the fixture happens to be "easy" (no bucket ever holds
two same-batch documents, so register-order never matters). sf0.001 is
the hard case: its 40 fixture documents DO collide (batch-1 emissions
and within-batch registrations occur), so parity here pins the
sequential-replay paths the gate scales never touch.
"""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="testdata not present",
)


def test_oracle_matches_streaming_operator_at_sf0001(spark):
    sp = (
        entry.queries()["streaming_neardup_docs"](spark, SF_DIR)
        .toPandas()
    )
    con = duckdb.connect()
    pq = os.path.join(SF_DIR, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    du = con.execute(entry.oracle_sql()["streaming_neardup_docs"]).df()

    cols = ["doc_id", "band", "matched_id", "est_jaccard", "run"]
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    du = (
        du[cols]
        .astype(sp.dtypes.to_dict())
        .sort_values(cols)
        .reset_index(drop=True)
    )
    # the interesting part: sf0.001 actually exercises batch-1
    # self-matches — if this stops holding the fixture got too easy
    assert (du["run"] == 0).any(), (
        "sf0.001 fixture no longer produces batch-1 emissions; "
        "the register-order replay paths are untested"
    )
    pd.testing.assert_frame_equal(sp, du)
