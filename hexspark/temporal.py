"""Temporal joins: as-of join and interval (range) join.

Two classic operators Spark's built-in join strategies lack, expressed
Spark-first (the build brief names both as custom-operator targets for
a large-scale training/event pipeline):

* :func:`asof_join` — for each probe row, the LATEST build row with
  ``build.ts <= probe.ts`` per key, optionally within a tolerance.
  ONE shuffle: both sides union into a single relation partitioned by
  the key and sorted by time; a running ``last(ignorenulls)`` window
  carries the most recent build payload forward onto each probe row.
  No per-probe scan, no cross product — the canonical distributed
  merge-asof (same plan shape pandas ``merge_asof`` implies, but
  executed as a Spark window over the union).

* :func:`range_join` — all (interval, point) pairs with
  ``start <= ts < end``.  Time is bucketed into fixed chunks sized by
  the widest interval; each interval explodes into the chunks it
  covers, candidates equi-join on the chunk id, and an exact native
  timestamp comparison refines.  Same candidate-cover pattern as
  ``geo.distance_join``, in one dimension — never an
  inequality-condition nested-loop join.

Determinism: tie-breaks are total (event order column), so both
operators have exact DuckDB twins in the oracle gate.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    build: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload: Sequence[str] = ("event_id", "value"),
    order_col: str = "event_id",
    tolerance: Optional[str] = None,
    suffix: str = "_m",
    split_seconds: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: each probe row gains the latest build row with
    ``build.ts_col <= probe.ts_col`` sharing ``on`` (NULLs when none).

    ``payload`` — build columns attached to the probe, renamed with
    ``suffix`` (the build's timestamp is always attached as
    ``{ts_col}{suffix}``).  ``order_col`` — total tie-break among
    equal-timestamp build rows (the max wins, matching the DuckDB twin's
    ``ORDER BY ts DESC, order_col DESC``).  ``tolerance`` — SQL interval
    string (e.g. ``'6 hours'``): matches older than it are nulled out,
    in exact integer interval arithmetic (no float epoch math, so the
    boundary is bit-identical cross-engine).

    Scale: one hash exchange on ``on`` + per-key sort — the minimal
    work any merge-asof does.  A pathologically hot key serializes its
    own window sort; ``split_seconds`` bounds that by partitioning the
    window on ``(key, coarse time chunk)`` instead — the hot key's rows
    spread across chunks (executed-plan-asserted in tests), the
    within-chunk running-last misses only matches from earlier chunks,
    and those are stitched back via a per-(key, chunk) carry-forward:
    the latest build row of every earlier chunk, computed on the TINY
    (key, chunk) relation and joined back.  Output is identical to the
    unsplit form (tested)."""
    b_sel = build.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(order_col).cast("long").alias("__ord"),
        F.struct(
            F.col(ts_col).alias("__bts"),
            *[F.col(c).alias(c) for c in payload],
        ).alias("__b"),
    )
    p_sel = probes.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__ord"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("__p"),
    )
    b_t = b_sel.schema["__b"].dataType
    p_t = p_sel.schema["__p"].dataType
    u = p_sel.withColumn("__b", F.lit(None).cast(b_t)).unionByName(
        b_sel.withColumn("__p", F.lit(None).cast(p_t))
    )
    if split_seconds is None:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side", "__ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn(
            "__m", F.last("__b", ignorenulls=True).over(w)
        ).filter(F.col("__side") == 1)
    else:
        if int(split_seconds) <= 0:
            # 0 would divide-by-zero deep in the plan; a negative chunk
            # width INVERTS the carry-forward ordering (future matches
            # for past probes) — fail loudly like shared_passages'
            # min_len guard
            raise ValueError(
                f"asof_join: split_seconds must be positive, got {split_seconds}"
            )
        chunk_us = int(split_seconds) * 1_000_000
        # integer floor division: __chunk as a LongType partition/join
        # key needs no float-exactness argument (the previous float
        # division was exact only because the numerator is a multiple of
        # chunk_us — correct, but fragile to future edits)
        u = u.withColumn(
            "__chunk",
            F.expr(
                f"unix_micros(CAST(__ts AS TIMESTAMP)) div {chunk_us}"
            ),
        )
        w = (
            Window.partitionBy("__k", "__chunk")
            .orderBy("__ts", "__side", "__ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # carry-forward: latest build row of every STRICTLY earlier
        # chunk, per (key, chunk) — both relations are bounded by the
        # number of occupied (key, chunk) pairs, not by row volume
        per_chunk = (
            u.filter(F.col("__side") == 0)
            .groupBy("__k", "__chunk")
            .agg(
                F.max_by(
                    "__b", F.struct(F.col("__ts"), F.col("__ord"))
                ).alias("__last_b")
            )
        )
        spine = u.select("__k", "__chunk").distinct()
        wc = (
            Window.partitionBy("__k")
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            spine.join(per_chunk, ["__k", "__chunk"], "left")
            .withColumn(
                "__carry", F.last("__last_b", ignorenulls=True).over(wc)
            )
            .select("__k", "__chunk", "__carry")
        )
        out = (
            u.join(carry, ["__k", "__chunk"], "left")
            .withColumn(
                "__m",
                F.coalesce(
                    F.last("__b", ignorenulls=True).over(w), F.col("__carry")
                ),
            )
            .filter(F.col("__side") == 1)
        )
    if tolerance is not None:
        keep = F.col("__m.__bts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn("__m", F.when(keep, F.col("__m")))
    return out.select(
        F.col("__p.*"),
        F.col("__m.__bts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload],
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    interval_key: str = "window_id",
    point_key: str = "event_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    ts_col: str = "ts",
    on: Optional[str] = None,
    chunk_seconds: Optional[int] = None,
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """All (interval, point) pairs with ``start <= ts < end`` (half-open),
    optionally also equal on ``on``.

    Chunked candidate cover: time is split into fixed ``chunk_seconds``
    buckets (default: the widest interval, measured with one tiny agg
    over the interval table); each interval explodes into the ≤
    ceil(len/chunk)+1 chunks it overlaps, candidates equi-join on the
    chunk id, and the exact native timestamp predicate refines.  The
    points side never shuffles while the exploded interval relation
    fits the broadcast budget; beyond it the chunk id becomes a
    shuffled equi-join key — never Spark's nested-loop fallback for
    pure inequality conditions.

    Chunk assignment is exact-integer epoch microseconds
    (``unix_micros``), so the cover has no float edge cases at all; the
    refine is pure timestamp comparison.
    """

    def micros(c) -> F.Column:
        # session tz is pinned UTC, so NTZ -> TZ is a reinterpretation
        return F.unix_micros(F.col(c).cast("timestamp"))

    widest = intervals.agg(
        F.max(micros(end_col) - micros(start_col))
    ).first()[0]
    widest = int(widest or 0)
    if chunk_seconds is None:
        chunk_seconds = max(1, widest // 1_000_000 + 1)
    chunk_us = F.lit(int(chunk_seconds) * 1_000_000)
    i_lo = micros(start_col) - (micros(start_col) % chunk_us)
    i_hi = micros(end_col) - (micros(end_col) % chunk_us)
    i_lo, i_hi = (i_lo / chunk_us).cast("long"), (i_hi / chunk_us).cast("long")
    ikeep = [interval_key, start_col, end_col] + ([on] if on else [])
    cand = intervals.select(
        *ikeep, F.explode(F.sequence(i_lo, i_hi)).alias("__chunk")
    )
    # broadcast gate must price the REAL explode fan-out: a caller-
    # supplied chunk_seconds much smaller than the widest interval
    # multiplies rows per interval (widest/chunk + 2 covers the two
    # boundary chunks), and a hint computed as if fan-out were ≤4
    # could broadcast far past the budget and OOM the driver
    per_interval = widest // (int(chunk_seconds) * 1_000_000) + 2
    n_intervals = intervals.count()
    if n_intervals * per_interval <= broadcast_rows:
        cand = F.broadcast(cand)
    pts = points.select(
        point_key,
        F.col(ts_col).alias("__pts"),
        *([on] if on else []),
        ((micros(ts_col) - (micros(ts_col) % chunk_us)) / chunk_us)
        .cast("long")
        .alias("__chunk"),
    )
    joined = pts.join(
        cand, on=["__chunk"] + ([on] if on else []), how="inner"
    ).filter(
        (F.col(start_col) <= F.col("__pts")) & (F.col("__pts") < F.col(end_col))
    )
    return joined.select(
        interval_key, point_key, F.col("__pts").alias(ts_col)
    )


# ---------------------------------------------------------------------------
# deterministic interval synth (Spark / DuckDB twins, oracle contract)
# ---------------------------------------------------------------------------

INTERVAL_EPOCH = "2024-01-01 00:00:00"


def synth_intervals(spark, sf_dir: str) -> DataFrame:
    """Deterministic maintenance-window table from supplier keys: start
    offset and length in exact integer minutes (cross-engine exact)."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        sup.select(
            F.col("s_suppkey").alias("window_id"),
            F.expr(
                f"TIMESTAMP '{INTERVAL_EPOCH}'"
                " + make_interval(0,0,0,0,0, CAST((s_suppkey * 7919) % 43200 AS INT), 0)"
            ).alias("start_ts"),
        )
        .withColumn(
            "end_ts",
            F.expr(
                "start_ts + make_interval(0,0,0,0,0,"
                " CAST(30 + (window_id % 180) AS INT), 0)"
            ),
        )
    )


def dd_intervals_cte() -> str:
    """DuckDB twin of :func:`synth_intervals`."""
    start = (
        f"TIMESTAMP '{INTERVAL_EPOCH}'"
        " + TO_MINUTES((s_suppkey * 7919) % 43200)"
    )
    return (
        f"SELECT s_suppkey AS window_id, {start} AS start_ts,"
        f" {start} + TO_MINUTES(30 + (s_suppkey % 180)) AS end_ts"
        " FROM supplier"
    )


def rolling_stats(
    events: DataFrame,
    window: str = "24 hours",
    on: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window features: for each event, the count and
    value-sum of the SAME key's events in the preceding ``window``
    (exclusive of the event itself) — the standard temporal feature
    block (burst detection, per-user rate features, velocity checks).

    Native range-frame window over exact integer epoch microseconds:
    one hash exchange on the key + per-key sort, the same minimal shape
    as :func:`asof_join`; the frame subtraction (current row excluded)
    stays in integer arithmetic end to end, so the DuckDB twin (RANGE
    BETWEEN n PRECEDING) is bit-identical.  ``window`` is a SQL
    interval string resolved to microseconds at plan time.

    The value sum is ``sum_value_prev_c`` in floored integer cents
    (``FLOOR(value * 100)`` summed): a float SUM over a window
    frame is addition-order-dependent and the two engines' frame
    evaluation orders differ, so the exactness rule here is the same as
    tfidf's — integerize first, then every aggregate is associative
    and order-free.
    """
    import re as _re

    m = _re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", window, _re.I
    )
    if not m:
        raise ValueError(
            f"rolling_stats: window must be '<n> seconds|minutes|hours|days',"
            f" got {window!r}"
        )
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    win_us = int(m.group(1)) * mult[m.group(2).lower()] * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(on)
        .orderBy(us.alias("__us"))
        .rangeBetween(-win_us, Window.currentRow)
    )
    # explicit FLOOR, not a bare cast: Spark's double->bigint cast
    # truncates while DuckDB's rounds — floor is the same in both
    cents = F.floor(F.col(value_col) * 100).cast("long")
    # the frame includes the current row; subtract it out exactly
    n_win = F.count("*").over(w) - 1
    sum_win = F.sum(cents).over(w) - cents
    return events.select(
        id_col,
        on,
        us.alias("ts_us"),
        n_win.cast("long").alias("n_prev"),
        sum_win.cast("long").alias("sum_value_prev_c"),
    )


def dd_rolling_stats(window_seconds: int) -> str:
    """DuckDB twin of :func:`rolling_stats` over events (24h default is
    window_seconds=86400)."""
    win_us = window_seconds * 1_000_000
    return f"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(COUNT(*) OVER w - 1 AS BIGINT) AS n_prev,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w
                    - CAST(FLOOR(value * 100) AS BIGINT) AS BIGINT)
                 AS sum_value_prev_c
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {win_us} PRECEDING AND CURRENT ROW
        )
    """


WEEK_SECONDS = 7 * 86400


def retention_cohorts(
    events: "DataFrame",
    period_seconds: int = WEEK_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> "DataFrame":
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST activity, and each (cohort, period_offset) cell counts
    how many of them were active that many periods later — the
    engagement-decay table behind every retention curve.

    Period index = ``unix_micros(ts) DIV (period_seconds * 10^6)``
    (integer microsecond epoch — exact cross-engine; calendar
    date_trunc is deliberately avoided so the twin can't diverge on
    week-start conventions).

    Shapes at scale: one distinct over (user, period) — map-side
    combinable and the ONLY events-scale shuffle; the first-period
    groupBy reuses the user key; the activity⋈first join is co-keyed
    on user (AQE picks the strategy); the final (cohort, offset)
    count is a plain combinable count over already-distinct rows —
    cohort×offset cardinality is tiny.
    """
    us = period_seconds * 1_000_000
    act = (
        events.select(
            F.col(user_col).alias("__u"),
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {us}"
            ).alias("__pw"),
        )
        .distinct()
    )
    first = act.groupBy("__u").agg(F.min("__pw").alias("cohort"))
    return (
        act.join(first, on="__u")
        .groupBy(
            "cohort", (F.col("__pw") - F.col("cohort")).alias("period_offset")
        )
        .agg(F.count("*").alias("n_active"))
    )


def dd_retention_cohorts(period_seconds: int = WEEK_SECONDS) -> str:
    """DuckDB twin of :func:`retention_cohorts` over events."""
    us = period_seconds * 1_000_000
    return f"""
        WITH act AS (
            SELECT DISTINCT user_id AS u,
                   epoch_us(ts) // {us} AS pw
            FROM events
        ),
        first AS (SELECT u, MIN(pw) AS cohort FROM act GROUP BY 1)
        SELECT f.cohort,
               CAST(a.pw - f.cohort AS BIGINT) AS period_offset,
               COUNT(*) AS n_active
        FROM act a JOIN first f USING (u)
        GROUP BY 1, 2
    """


def funnel(
    events: "DataFrame",
    steps: "Sequence[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> "DataFrame":
    """Ordered conversion funnel: for each user, the earliest timestamp
    at which each stage completes, where stage ``i`` must occur
    STRICTLY AFTER the user's stage ``i-1`` completion (the standard
    product-analytics funnel — a purchase before the first view does
    not convert a view→purchase funnel).

    Output: one row per user who completed stage 0 — ``user_col``,
    ``t0_us..t{n-1}_us`` (integer microsecond epochs, NULL once the
    user stalls), ``stage_reached`` (count of completed stages, 1-based).
    Aggregate downstream for the classic per-stage decay counts.

    Shapes at scale: stage 0 is one map-side-combinable conditional
    min; each later stage is an equi-join on the user key against only
    that stage's filtered events followed by another combinable min —
    every shuffle keys on ``user_col``, so AQE reuses/co-locates the
    partitioning, and per-stage volume is that event type's rows, not
    the whole log.  Strictly-after comparisons and epochs are integer
    micros end to end (exact cross-engine).
    """
    us = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.expr(f"min({us})").alias("t0_us"))
    )
    for i, step in enumerate(steps[1:], 1):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.expr(us).alias("__ts")
        )
        prev_cols = [f"t{j}_us" for j in range(i)]
        hits = (
            cur.join(nxt, on=user_col)
            .filter(F.col("__ts") > F.col(f"t{i - 1}_us"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{i}_us"))
        )
        cur = cur.join(hits, on=user_col, how="left")
    stage = sum(
        F.when(F.col(f"t{i}_us").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return cur.withColumn("stage_reached", stage.cast("long"))


def dd_funnel(steps: "Sequence[str]") -> str:
    """DuckDB twin of :func:`funnel` over events."""
    ctes = [
        f"""s0 AS (
            SELECT user_id, MIN(epoch_us(ts)) AS t0_us
            FROM events WHERE event_type = '{steps[0]}'
            GROUP BY 1
        )"""
    ]
    for i, step in enumerate(steps[1:], 1):
        ctes.append(f"""s{i} AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS t{i}_us
            FROM events e JOIN s{i - 1} p USING (user_id)
            WHERE e.event_type = '{step}'
              AND epoch_us(e.ts) > p.t{i - 1}_us
            GROUP BY 1
        )""")
    joins = " ".join(
        f"LEFT JOIN s{i} USING (user_id)" for i in range(1, len(steps))
    )
    tcols = ", ".join(f"t{i}_us" for i in range(len(steps)))
    reached = " + ".join(
        f"(CASE WHEN t{i}_us IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(steps))
    )
    return f"""
        WITH {', '.join(ctes)}
        SELECT user_id, {tcols}, CAST({reached} AS BIGINT) AS stage_reached
        FROM s0 {joins}
    """
