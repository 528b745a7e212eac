"""Batch-8 event-analytics shapes: ordered funnel, hopping windows,
calendar gap-fill.

Value correctness vs DuckDB is pinned by the oracle gate; these tests pin
the ordering semantics on hand-made event sequences and the plan
properties that matter at scale (no partition-less windows, dimension-only
crossJoins, exchange-reusable chained aggregates).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from anomalydetection_spark.plans import driver_queries_events as dqe

SF = "/root/testdata/sf0.01"


def _formatted(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _write_events(spark, tmpdir, rows):
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, m), u, t, 0.0, "{}")
            for i, (d, h, m, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmpdir}/events.parquet")


def test_funnel_requires_strict_order(spark, tmp_path):
    # user 1: signup -> view -> purchase (converts all stages)
    # user 2: view BEFORE signup, purchase after signup but no view after
    #         signup -> stops at stage 1
    # user 3: signup -> view, purchase BEFORE the view -> stops at stage 2
    # user 4: never signs up -> not even stage 1
    rows = [
        (1, 1, 0, 1, "signup"), (1, 2, 0, 1, "view"), (1, 3, 0, 1, "purchase"),
        (2, 1, 0, 2, "view"), (2, 2, 0, 2, "signup"), (2, 3, 0, 2, "purchase"),
        (3, 1, 0, 3, "signup"), (3, 3, 0, 3, "view"), (3, 2, 0, 3, "purchase"),
        (4, 1, 0, 4, "view"), (4, 2, 0, 4, "purchase"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["stage"]: r for r in dqe.funnel_stages(spark, str(tmp_path)).collect()}
    assert out[1]["n_users"] == 3  # users 1,2,3 signed up
    assert out[2]["n_users"] == 2  # users 1,3 viewed after signup
    assert out[3]["n_users"] == 1  # only user 1 purchased after that view
    assert abs(out[3]["share_of_stage1"] - round(1 / 3, 6)) < 1e-9
    # user 2's purchase exists but doesn't count: no qualifying view


def test_funnel_no_window_joins_hash_on_user(spark):
    plan = _formatted(spark, dqe.funnel_stages(spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # only the 1-row base count crossJoins (broadcast)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_hopping_each_event_in_two_windows(spark, tmp_path):
    # one event at 02:15 on Jan 2 -> windows [01:30,02:30) and [02:00,03:00)
    rows = [(2, 2, 15, 1, "click")]
    _write_events(spark, tmp_path, rows)
    out = sorted(
        (r["window_start"], r["n_events"])
        for r in dqe.hopping_window_counts(spark, str(tmp_path)).collect()
    )
    assert [w.strftime("%H:%M") for w, _ in out] == ["01:30", "02:00"]
    assert all(n == 1 for _, n in out)


def test_hopping_is_expand_not_join(spark):
    plan = _formatted(spark, dqe.hopping_window_counts(spark, SF))
    # window assignment expands JVM-side; no self-join/range-join
    assert "Expand" in plan or "Generate" in plan
    assert "Join" not in plan


def test_gapfill_emits_empty_days_and_idle_users(spark, tmp_path):
    # 3-day span; user 1 active day 1 and 3, user 2 active day 1 only;
    # day 2 has an 'error'-only event (excluded) -> fully idle day still
    # emitted via the dense calendar
    rows = [
        (1, 1, 0, 1, "click"), (1, 1, 5, 2, "view"),
        (2, 1, 0, 1, "error"),
        (3, 1, 0, 1, "click"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["day"].isoformat(): r
        for r in dqe.gapfill_daily_activity(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert out["2024-01-01"]["n_active_users"] == 2
    assert out["2024-01-02"]["n_active_users"] == 0
    assert out["2024-01-02"]["n_idle_users"] == 2
    assert out["2024-01-03"]["n_active_users"] == 1
    assert out["2024-01-03"]["n_idle_users"] == 1


def test_gapfill_grid_is_dimension_sized(spark):
    plan = _formatted(spark, dqe.gapfill_daily_activity(spark, SF))
    # the day-dimension explode is broadcast into the user dim; the fact
    # table joins the grid only AFTER per-(day,user) pre-aggregation
    assert "BroadcastNestedLoopJoin" in plan  # |days| x |users| grid only
    assert "Window" not in plan
    grid_pos = plan.find("BroadcastNestedLoopJoin")
    agg_pos = plan.find("partial_count")
    assert agg_pos != -1 and grid_pos != -1


def test_unpivot_is_expand_not_union(spark):
    df = dqe.unpivot_user_metrics(spark, SF)
    plan = _formatted(spark, df)
    # melt expands JVM-side over ONE computed wide aggregate — never a
    # UNION of per-metric scans
    assert "Expand" in plan
    assert "Union" not in plan
    assert plan.count("Scan parquet") <= 2  # one logical scan (tree + details)
    assert dict(df.dtypes)["value"] == "bigint"


def test_unpivot_round_trips_wide_values(spark, tmp_path):
    rows = [(1, 1, 0, 7, "click"), (1, 2, 0, 7, "view"), (2, 1, 0, 13, "click")]
    _write_events(spark, tmp_path, rows)
    # user_id 13 % 10 == 3 passes the filter; 7 doesn't
    out = dqe.unpivot_user_metrics(spark, str(tmp_path)).collect()
    got = {(r["user_id"], r["metric"]): r["value"] for r in out}
    assert set(u for u, _ in got) == {13}
    assert got[(13, "n_events")] == 1
    assert got[(13, "n_types")] == 1
    assert got[(13, "value_fp")] == 0
