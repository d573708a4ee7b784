"""Round-9 targeted adversarial cases: each r9-new oracle gets a dataset
planted exactly at its branch points, then runs through the same
Spark↔DuckDB gate the driver uses.

- events_cusum_drift: a FLAT series (cusum must clamp at 0 — never
  alarm), a SUSTAINED 3× step covering the last quarter (alarm must fire
  exactly once the accumulated drift crosses 3μ — hour 6 of the step,
  not at the step itself), a single ISOLATED spike (big enough for the
  z-score detector but NOT sustained — CUSUM must stay silent; this is
  the behavioral difference between the two detectors), and a
  single-hour type (no history — no alarm).
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .util import assert_matches_oracle

sys.path.insert(0, "/root/repo")


def _duck_for(d: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con


def _entry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


# ------------------------------------------------------------ cusum drift
HOUR_US = 3_600_000_000
BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


@pytest.fixture(scope="module")
def cusum_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cusumadv")
    rows = []  # (event_type, hour_idx, events_in_hour)

    def emit(etype: str, hour: int, n: int):
        for j in range(n):
            rows.append((etype, BASE_US + hour * HOUR_US + j * 60_000_000))

    # flat: 10/hour for 48h -> y ≡ -mu/2 < 0 every hour, cusum clamps at 0
    for h in range(48):
        emit("flat", h, 10)
    # drift: 36h at 10/hour then a SUSTAINED 12h at 30/hour.
    # mu = (36*10 + 12*30)/48 = 15 -> mu_e6 = 15e6, k = 7.5e6.
    # pre-step y = -12.5e6 (cusum 0); step y = +7.5e6/hour, so cusum
    # crosses the 3mu = 45e6 alarm line at step hour 6 -> alarm rows are
    # exactly hours 41..47 (7 rows)
    for h in range(36):
        emit("drift", h, 10)
    for h in range(36, 48):
        emit("drift", h, 30)
    # spike: one isolated 30-event hour in 48h of 10s. mu_e6 = 10_416_666,
    # y_spike = 30e6 - 1.5*mu ≈ +14.4e6 < 3mu ≈ 31.2e6 -> never alarms
    # (a z-score detector fires here; CUSUM requires SUSTAINED drift)
    for h in range(48):
        emit("spike", h, 30 if h == 20 else 10)
    # single: one hour of history -> y = -mu/2, no alarm possible
    emit("single", 0, 5)

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def test_cusum_drift_branch_points(spark, cusum_dir):
    queries, oracles = _entry()
    con = _duck_for(cusum_dir, ["events"])
    assert_matches_oracle(
        queries["events_cusum_drift"](spark, cusum_dir),
        con,
        oracles["events_cusum_drift"],
    )
    out = queries["events_cusum_drift"](spark, cusum_dir).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["hour"])

    # flat: clamped at zero everywhere, no alarms
    assert all(r["cusum_e6"] == 0 and not r["alarm"] for r in by_type["flat"])
    # drift: silent through the stable window, alarms exactly at step
    # hour 6 onward (accumulation, not instant reaction)
    alarms = [i for i, r in enumerate(by_type["drift"]) if r["alarm"]]
    assert alarms == list(range(41, 48)), alarms
    assert by_type["drift"][41]["cusum_e6"] == 45_000_000
    assert all(r["cusum_e6"] == 0 for r in by_type["drift"][:36])
    # spike: a one-hour outlier is not sustained drift -> silent
    assert not any(r["alarm"] for r in by_type["spike"])
    # single-hour type: negative deviation clamps to 0
    assert by_type["single"] == [by_type["single"][0]]
    assert by_type["single"][0]["cusum_e6"] == 0
    assert not by_type["single"][0]["alarm"]


# ------------------------------------------------------- minhash_est_error
@pytest.fixture(scope="module")
def esterr_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("esterradv")
    run = ("the quick brown fox jumps over the lazy dog while rain falls "
           "on the quiet grey town and the river keeps moving slowly north")
    docs = [
        # identical pair: est = exact = 1.0 exactly -> err_ppm must be 0
        (1, run),
        (2, run),
        # sub-shingle pair: both docs shorter than one 3-token shingle ->
        # empty gram sets, all-sentinel signatures -> est 1.0 AND the
        # defined exact = 1.0 branch (the union-0 CASE) -> err_ppm 0
        (3, "hi there"),
        (4, "bye now"),
        # genuine near-dup: one token substituted mid-run -> est is the
        # 64-perm estimate, exact is the true shingle Jaccard; the pair
        # must survive the tau cut and err_ppm = est - exact
        (5, run.replace("river", "ocean")),
        # unrelated singleton: must produce no pair at all
        (6, "completely different content about parquet footers and row groups"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["web"] * len(docs)),
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_minhash_est_error_branch_points(spark, esterr_dir):
    queries, oracles = _entry()
    con = _duck_for(esterr_dir, ["documents"])
    assert_matches_oracle(
        queries["minhash_est_error"](spark, esterr_dir),
        con,
        oracles["minhash_est_error"],
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in queries["minhash_est_error"](spark, esterr_dir).collect()
    }
    assert rows[(1, 2)]["est_ppm"] == 1_000_000
    assert rows[(1, 2)]["exact_ppm"] == 1_000_000
    assert rows[(1, 2)]["err_ppm"] == 0
    # the union-0 branch: empty-gram docs pair with est = exact = 1
    assert rows[(3, 4)]["exact_ppm"] == 1_000_000
    assert rows[(3, 4)]["err_ppm"] == 0
    # the genuine near-dup survived the tau cut with a real exact score
    near = rows[(1, 5)] if (1, 5) in rows else rows[(2, 5)]
    assert 500_000 <= near["est_ppm"] <= 1_000_000
    assert near["exact_ppm"] < 1_000_000  # one substituted token != identical
    assert near["err_ppm"] == near["est_ppm"] - near["exact_ppm"]
    # the unrelated doc never pairs
    assert not any(6 in k for k in rows)
