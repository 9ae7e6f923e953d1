"""asof_join / range_join vs brute-force truth (hexspark.temporal)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hexspark.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _asof_brute(probes, build, tolerance_hours=None):
    cond = (F.col("b.user_id") == F.col("p.user_id")) & (
        F.col("b.ts") <= F.col("p.ts")
    )
    if tolerance_hours is not None:
        cond = cond & (
            F.col("b.ts")
            >= F.col("p.ts") - F.expr(f"INTERVAL '{tolerance_hours}' HOUR")
        )
    j = probes.alias("p").join(build.alias("b"), cond, "left")
    w = Window.partitionBy("p.event_id").orderBy(
        F.col("b.ts").desc_nulls_last(), F.col("b.event_id").desc_nulls_last()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            F.col("p.event_id").alias("event_id"),
            F.col("b.ts").alias("ts_m"),
            F.col("b.event_id").alias("event_id_m"),
            F.col("b.value").alias("value_m"),
        )
    )


def _asof_map(df):
    return {
        r["event_id"]: (r["ts_m"], r["event_id_m"], r["value_m"])
        for r in df.collect()
    }


def test_asof_join_vs_brute(events):
    probes = events.filter(F.col("event_type") == "purchase")
    build = events.filter(F.col("event_type") == "click")
    got = asof_join(probes, build, on="user_id", ts_col="ts",
                    payload=("event_id", "value"), order_col="event_id")
    assert got.columns[-3:] == ["ts_m", "event_id_m", "value_m"]
    g = _asof_map(got.select("event_id", "ts_m", "event_id_m", "value_m"))
    b = _asof_map(_asof_brute(probes, build))
    assert g == b and len(g) == probes.count()
    # every probe row is preserved; most have a match, some don't
    n_matched = sum(1 for v in g.values() if v[1] is not None)
    assert 0 < n_matched < len(g)


def test_asof_join_split_matches_unsplit(events):
    """The split_seconds hot-key pre-split returns row-identical output
    to the unsplit window form (including tolerance nulling), and the
    executed plan shows the hot key's rows hash-spread over the
    (key, chunk) pair, not serialized into one per-key partition."""
    probes = events.filter(F.col("event_type") == "purchase")
    build = events.filter(F.col("event_type") == "click")
    # plant a pathologically hot key: every build row duplicated onto
    # one user spanning the full time range
    hot_b = build.withColumn("user_id", F.lit(99999))
    hot_p = probes.limit(50).withColumn("user_id", F.lit(99999))
    b2, p2 = build.unionByName(hot_b), probes.unionByName(hot_p)
    kw = dict(on="user_id", ts_col="ts", payload=("event_id", "value"),
              order_col="event_id")
    base = asof_join(p2, b2, **kw)
    split = asof_join(p2, b2, split_seconds=6 * 3600, **kw)
    assert _asof_map(
        split.select("event_id", "ts_m", "event_id_m", "value_m")
    ) == _asof_map(base.select("event_id", "ts_m", "event_id_m", "value_m"))
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan
    import re
    # the big window's exchange partitions on (key, chunk)
    assert re.search(r"hashpartitioning\(__k#\d+L?, __chunk#\d+", plan), plan
    # tolerance composes with the split
    base_t = asof_join(p2, b2, tolerance="'6' HOUR", **kw)
    split_t = asof_join(p2, b2, tolerance="'6' HOUR",
                        split_seconds=3600, **kw)
    assert _asof_map(
        split_t.select("event_id", "ts_m", "event_id_m", "value_m")
    ) == _asof_map(base_t.select("event_id", "ts_m", "event_id_m", "value_m"))
    # non-positive chunk widths fail loudly: 0 would divide-by-zero at
    # execution, a negative width would INVERT the carry-forward
    import pytest
    for bad in (0, -3600):
        with pytest.raises(ValueError, match="split_seconds"):
            asof_join(p2, b2, split_seconds=bad, **kw)


def test_asof_join_tolerance(events):
    probes = events.filter(F.col("event_type") == "purchase")
    build = events.filter(F.col("event_type") == "click")
    got = asof_join(probes, build, tolerance="'6' HOUR")
    g = _asof_map(got.select("event_id", "ts_m", "event_id_m", "value_m"))
    b = _asof_map(_asof_brute(probes, build, tolerance_hours=6))
    assert g == b
    # the tolerance must actually cut matches vs the unbounded join
    unbounded = _asof_map(_asof_brute(probes, build))
    assert (
        sum(1 for v in g.values() if v[1] is not None)
        < sum(1 for v in unbounded.values() if v[1] is not None)
    )


def _intervals(spark, sf_dir):
    from hexspark.temporal import synth_intervals

    return synth_intervals(spark, sf_dir)


def _range_brute(iv, events, on=None):
    ev = events.select(
        "event_id", "ts", F.col("user_id").alias("__eu")
    )
    cond = (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts"))
    j = iv.crossJoin(ev).filter(cond)
    if on:
        j = j.filter(F.col("__eu") == F.col(on))
    return j.select("window_id", "event_id", "ts")


def test_range_join_vs_brute(spark, sf_dir, events):
    iv = _intervals(spark, sf_dir)
    got = range_join(iv, events)
    g = set(map(tuple, got.collect()))
    b = set(map(tuple, _range_brute(iv, events).collect()))
    assert g == b and len(b) > 0
    # forced-small chunks (multi-chunk intervals) cover identically
    got2 = range_join(iv, events, chunk_seconds=600)
    assert set(map(tuple, got2.collect())) == b
    # shuffled (no-broadcast) branch
    got3 = range_join(iv, events, broadcast_rows=1)
    assert set(map(tuple, got3.collect())) == b


def test_range_join_with_equality_key(spark, sf_dir, events):
    iv = _intervals(spark, sf_dir).withColumn(
        "user_id", F.col("window_id") % 150
    )
    got = range_join(iv, events, on="user_id")
    g = set(map(tuple, got.collect()))
    b = set(map(tuple, _range_brute(iv, events, on="user_id").collect()))
    assert g == b


def test_range_join_broadcast_plan(spark, sf_dir, events):
    iv = _intervals(spark, sf_dir)
    out = range_join(iv, events)
    # interval stencil broadcasts; the events side must not shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_range_join_broadcast_gate_prices_chunk_fanout(spark, sf_dir, events):
    # a tiny caller-supplied chunk multiplies rows per interval; the
    # broadcast gate must price that fan-out, not assume <=4.  Widest
    # interval here is ~209 min -> chunk_seconds=60 explodes each
    # interval into ~200+ chunks; with a budget that the OLD n*4
    # estimate would have passed, the hint must NOT fire.
    iv = _intervals(spark, sf_dir)
    n = iv.count()
    budget = n * 10  # old gate (n*4) would broadcast; true fan-out >> 10
    out = range_join(iv, events, chunk_seconds=60, broadcast_rows=budget)
    # the explicit hint must not fire (the planner may still pick a
    # broadcast on its own size estimate at this tiny SF — that's AQE's
    # call against autoBroadcastJoinThreshold, not ours against budget)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    wide_enough = range_join(iv, events, chunk_seconds=60)
    analyzed2 = wide_enough._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in analyzed2.lower()  # default budget: hint fires
    # and the result is still exact
    b = set(map(tuple, _range_brute(iv, events).collect()))
    assert set(map(tuple, out.collect())) == b


def test_rolling_stats_vs_brute(events):
    """Trailing-2h features == brute-force self-join (count + exact
    cents sum, current row excluded, boundary inclusive)."""
    from hexspark.temporal import rolling_stats

    sub = events.filter(F.col("user_id") < 20)
    got = {r["event_id"]: (r["n_prev"], r["sum_value_prev_c"])
           for r in rolling_stats(sub, window="2 hours").collect()}
    cents = F.floor(F.col("b.value") * 100).cast("long")
    brute = (
        sub.alias("p")
        .join(
            sub.alias("b"),
            (F.col("b.user_id") == F.col("p.user_id"))
            & (F.col("b.ts") <= F.col("p.ts"))
            & (F.col("b.event_id") != F.col("p.event_id"))
            & (
                F.col("b.ts")
                >= F.col("p.ts") - F.expr("INTERVAL '2' HOUR")
            ),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(
            F.count(F.col("b.event_id")).alias("n_prev"),
            F.coalesce(F.sum(cents), F.lit(0)).alias("sum_c"),
        )
    )
    b = {r["event_id"]: (r["n_prev"], r["sum_c"]) for r in brute.collect()}
    assert got == b and len(got) == sub.count()
    assert any(v[0] > 0 for v in got.values())


def test_rolling_stats_window_parse(events):
    import pytest as _pytest

    from hexspark.temporal import rolling_stats

    with _pytest.raises(ValueError):
        rolling_stats(events, window="fortnight")


def test_retention_cohorts_planted(spark):
    """Two users cohorted in week 0 (one retained into week 1, one
    not); a third user starts in week 1."""
    import datetime as dt

    from hexspark.temporal import retention_cohorts

    wk = 7 * 86400
    t0 = dt.datetime(2024, 1, 4)  # arbitrary anchor
    rows = []
    for i, (user, off_s) in enumerate(
        [(1, 0), (1, 3600), (1, wk + 60), (2, 100), (3, wk + 5)]
    ):
        rows.append((i, t0 + dt.timedelta(seconds=off_s), user, "c", 0.0, ""))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        (r["cohort"], r["period_offset"]): r["n_active"]
        for r in retention_cohorts(events).collect()
    }
    w0 = min(c for c, _ in got)
    # user 1+2 start in w0; user 1 returns at offset 1; user 3 starts w0+1
    assert got[(w0, 0)] == 2
    assert got[(w0, 1)] == 1
    assert got[(w0 + 1, 0)] == 1
    assert len(got) == 3


def test_funnel_planted(spark):
    """Strict ordering: a purchase BEFORE the first view doesn't
    convert; stalls stop at the right stage; the earliest qualifying
    ts wins."""
    import datetime as dt

    from hexspark.temporal import funnel

    t0 = dt.datetime(2024, 3, 1)

    def ev(i, user, typ, s):
        return (i, t0 + dt.timedelta(seconds=s), user, typ, 0.0, "")

    rows = [
        # user 1: full funnel, plus a decoy purchase before the view
        ev(0, 1, "purchase", 0), ev(1, 1, "view", 10),
        ev(2, 1, "click", 20), ev(3, 1, "purchase", 30),
        ev(4, 1, "click", 15),          # earliest qualifying click
        # user 2: view then click, never purchases after the click
        ev(5, 2, "view", 0), ev(6, 2, "click", 5),
        # user 3: only a click -> not in the funnel at all
        ev(7, 3, "click", 0),
        # user 4: view only
        ev(8, 4, "view", 100),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        r["user_id"]: r
        for r in funnel(events, ("view", "click", "purchase")).collect()
    }
    assert set(got) == {1, 2, 4}
    base = got[1]["t0_us"]
    assert got[1]["stage_reached"] == 3
    assert got[1]["t1_us"] == base + 5_000_000   # click at +15s, view +10s
    assert got[1]["t2_us"] == base + 20_000_000  # purchase at +30s
    assert got[2]["stage_reached"] == 2 and got[2]["t2_us"] is None
    assert got[4]["stage_reached"] == 1 and got[4]["t1_us"] is None
