"""Event-stream batch analytics: funnel conversion and cohort retention.

The product-analytics query family the reference served with chained
MapReduce jobs over Scribe logs (secondary-sort per user, then a
re-reduce per cohort/stage); here each is one declarative plan whose
user-keyed work rides a SINGLE hash shuffle (windows over the same
partition key merge) and whose final aggregates run on tiny keyspaces.

New module (round 5) so no existing file crosses the 2k-line registry
hygiene threshold; registration order of pre-existing names unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _t,
    register,
)


@register(
    "funnel_conversion",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS v
      FROM events
    ),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
                  OVER (PARTITION BY user_id) AS c
      FROM w1
    ),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
                  OVER (PARTITION BY user_id) AS p
      FROM w2
    ),
    per_user AS (SELECT DISTINCT user_id, v, c, p FROM w3),
    agg AS (SELECT COUNT(v) AS nv, COUNT(c) AS nc, COUNT(p) AS np FROM per_user)
    SELECT stage_idx, stage, n_users,
           (ROUND(n_users * 1.0 / NULLIF(nv, 0), 6) + 0) AS conversion
    FROM (
      SELECT 1 AS stage_idx, 'view' AS stage, CAST(nv AS BIGINT) AS n_users, nv FROM agg
      UNION ALL
      SELECT 2, 'click', CAST(nc AS BIGINT), nv FROM agg
      UNION ALL
      SELECT 3, 'purchase', CAST(np AS BIGINT), nv FROM agg
    )
    ORDER BY stage_idx
    """,
    note="ordered funnel (view -> click -> purchase, strict timestamp order per user): users reaching each stage and conversion vs stage 1 — nested same-partition window minima, one user shuffle",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: a user converts at stage N only via an event
    AFTER their stage-N-1 time (first view, first click after that
    view, first purchase after that click).

    Deliberate plan A/B with round 2's ``funnel_analysis`` (same stage
    semantics): that form chains three conditional-min aggregations via
    broadcast joins (the reference's one-job-per-stage idiom — N-1 join
    stages, wide single-row output); this form computes all stages in
    nested windows over ONE shuffle and emits the long-form stage table
    with conversion rates.  Both oracle-checked; at 100 TB the window
    form shuffles events once where the join chain re-broadcasts a
    growing per-user stage table per stage.

    Scale plan: the three stage times are nested MIN-over-user windows —
    all share the user_id partitioning, so Catalyst plans ONE hash
    shuffle and evaluates the windows back-to-back without
    re-exchanging; per-user rows then collapse (distinct on the window
    outputs) and the stage table is built by unpivoting a single-row
    aggregate — no second pass over events, no joins."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "c",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("v")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .select("user_id", "v", "c", "p")
        .distinct()
    )
    agg = staged.agg(
        F.count("v").alias("nv"), F.count("c").alias("nc"), F.count("p").alias("np")
    )
    stages = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(col).cast("long").alias("n_users"),
        )
        for i, (name, col) in enumerate(
            [("view", "nv"), ("click", "nc"), ("purchase", "np")], start=1
        )
    ]
    return (
        agg.select(F.explode(F.array(*stages)).alias("s"), F.col("nv"))
        .select(
            "s.stage_idx",
            "s.stage",
            "s.n_users",
            F.round(
                F.col("s.n_users")
                / F.when(F.col("nv") != 0, F.col("nv")).cast("double"),
                6,
            ).alias("conversion"),
        )
        .orderBy("stage_idx")
    )


@register(
    "grouped_ols_trend",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts) AS DECIMAL(18,0))) AS sx,
             SUM(CAST(value AS DECIMAL(28,6))) AS sy,
             SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts) AS DECIMAL(10,0))
                 * CAST(value AS DECIMAL(20,6))) AS sxy,
             SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts) AS DECIMAL(18,0))
                 * CAST(date_diff('second', TIMESTAMP '2024-01-01', ts) AS DECIMAL(18,0))) AS sxx
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           (ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400, 6) + 0)
             AS slope_per_day,
           (ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) + 0) AS intercept
    FROM s ORDER BY event_type
    """,
    note="per-group closed-form OLS (value ~ time): slope/day + intercept from five decimal-exact sufficient statistics in one partial-agg'd pass — never regr_slope's float accumulation",
)
def grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of event value over time, per event type —
    the grouped-regression analytic, computed from sufficient
    statistics: n, Σx, Σy, Σxy, Σx² with x = seconds since 2024-01-01
    (integer, offset keeps magnitudes decimal-safe) and every sum
    aggregated in DECIMAL, then one fixed double expression for
    slope/intercept.

    Built-in ``regr_slope`` accumulates in floating point — addition
    order varies with partitioning, so results drift run-to-run and
    engine-to-engine; the decimal sufficient-statistics form is exact,
    order-independent, and partial-agg friendly (one shuffle on the
    tiny group key) — the `exact_sum_double` discipline applied to
    regression.

    Rows with NULL value are excluded up front: SUM skips them but
    COUNT(*) would not, and mixed sufficient statistics (n over all
    rows, sy/sxy over non-null only) give a silently wrong slope —
    a both-engines-agree-on-the-wrong-answer class the oracle gate
    cannot catch, so the filter must be explicit on BOTH sides."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.col("ts").cast("long") - F.lit(1704067200)  # 2024-01-01 UTC
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(18,0)")).alias("sx"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sy"),
        F.sum(
            x.cast("decimal(10,0)") * F.col("value").cast("decimal(20,6)")
        ).alias("sxy"),
        F.sum(x.cast("decimal(18,0)") * x.cast("decimal(18,0)")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    slope_sec = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return (
        s.select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.round(slope_sec * 86400, 6).alias("slope_per_day"),
            F.round((syd - slope_sec * sxd) / nd, 6).alias("intercept"),
        )
        .orderBy("event_type")
    )


@register(
    "resample_ffill",
    """
    WITH rng AS (
      SELECT user_id,
             DATE_TRUNC('day', MIN(ts)) AS t0,
             MAX(ts) AS t1
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS ts,
             NULL::DOUBLE AS value, NULL::BIGINT AS event_id
      FROM rng
    ),
    ev AS (SELECT user_id, ts, value, event_id FROM events),
    unioned AS (SELECT * FROM grid UNION ALL SELECT * FROM ev),
    filled AS (
      SELECT user_id, ts, event_id,
             LAST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, COALESCE(event_id, 4611686018427387904)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM unioned
    )
    SELECT user_id, ts AS grid_ts, (ROUND(v, 6) + 0) AS value
    FROM filled WHERE event_id IS NULL
    ORDER BY user_id, grid_ts
    """,
    note="time-series resample + forward fill: per-user daily grid between first (day-truncated) and last event, each grid point carrying the last event value at or before it — grid and events merged under ONE user window, no per-point lookup join",
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an irregular event series: one row per user per day
    in the user's active range, valued by the most recent event at or
    before that instant (forward fill; NULL before the first event —
    never fabricated).

    Scale plan: the day grid is a row-local ``sequence`` explode off the
    per-user (min, max) aggregate — no calendar table join; grid and
    event rows then share ONE user_id-partitioned window where
    ``last(value, ignorenulls)`` does the fill — the per-grid-point
    as-of join is replaced by a single sort within each user's
    partition.  Ordering is made total (ts, then event_id with grid
    rows forced last via a sentinel — engines disagree on NULL sort
    order, so no bare NULL keys) to keep same-timestamp fills
    deterministic in both engines."""
    ev = _t(spark, sf_dir, "events")
    rng = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = rng.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 DAY"))
        ).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("long").alias("event_id"),
    )
    unioned = grid.unionByName(ev.select("user_id", "ts", "value", "event_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.coalesce(F.col("event_id"), F.lit(1 << 62)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("v", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNull())
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            F.round("v", 6).alias("value"),
        )
        .orderBy("user_id", "grid_ts")
    )


@register(
    "cohort_retention_rate",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             MIN(DATE_TRUNC('week', ts)) OVER (PARTITION BY user_id) AS cohort_w,
             DATE_TRUNC('week', ts) AS active_w
      FROM events
    ),
    cells AS (
      SELECT STRFTIME(cohort_w, '%Y-%m-%d') AS cohort_week,
             CAST(DATE_DIFF('day', cohort_w, active_w) / 7 AS BIGINT) AS week_offset,
             COUNT(*) AS n_active
      FROM act GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_active,
           (ROUND(n_active * 1.0 / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_week), 6) + 0) AS retention
    FROM cells
    ORDER BY cohort_week, week_offset
    """,
    note="weekly cohort retention RATE table (the week-0-normalized companion of the r2 cohort_retention counts query): one user window shuffle, cells + denominator on the tiny cohort grid",
)
def cohort_retention_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort table: cohort = the ISO week (Monday-truncated, so
    both engines agree) of a user's first event; each (cohort, offset)
    cell counts users active that many weeks later; retention divides
    by the cohort's week-0 size.

    Scale plan: cohort assignment is a MIN window over user_id (one
    hash shuffle of events); the distinct collapses to one row per
    (user, week); the cell aggregation and the week-0 denominator
    window both run on the tiny (cohort × offset) grid — the fact
    relation is shuffled exactly once."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        ev.select(
            "user_id",
            F.min(F.date_trunc("week", F.col("ts"))).over(w).alias("cohort_w"),
            F.date_trunc("week", F.col("ts")).alias("active_w"),
        )
        .distinct()
    )
    cells = act.groupBy(
        F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
        (
            F.datediff(F.to_date("active_w"), F.to_date("cohort_w")) / 7
        ).cast("long").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    wc = Window.partitionBy("cohort_week")
    return (
        cells.select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active")
                / F.max(
                    F.when(F.col("week_offset") == 0, F.col("n_active"))
                ).over(wc).cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    grid AS (
      SELECT event_type AS from_type, next_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           (ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) + 0) AS p
    FROM grid ORDER BY from_type, to_type
    """,
    note="per-user event-type transition matrix (first-order Markov counts + row-normalized probabilities): LEAD over the user stream, aggregate on the tiny type x type grid",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What follows what: per user (ordered by ts, event_id for a total
    order), count event_type -> next event_type transitions and
    normalize per source type — the first-order Markov behavior model
    behind next-action prediction and bot detection.

    Scale plan: LEAD rides ONE user_id hash shuffle (the same single
    fact shuffle as the rest of this family); the transition grid is
    |event_types|² rows, so the normalizing window and sort are free.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grid = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return grid.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "daily_anomaly_zscore",
    """
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS nd,
             CAST(CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(n_events AS DECIMAL(18,0))
                      * CAST(n_events AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) AS ss
      FROM daily GROUP BY event_type
    ),
    scored AS (
      SELECT d.event_type, d.day, d.n_events,
             (d.n_events - s / nd) / sqrt((ss - s * s / nd) / (nd - 1)) AS z
      FROM daily d JOIN stats st ON st.event_type = d.event_type
      WHERE nd >= 2 AND (ss - s * s / nd) > 0
    )
    SELECT event_type, day, n_events, (ROUND(z, 6) + 0) AS z
    FROM scored WHERE ABS(z) >= 2
    ORDER BY event_type, day
    """,
    note="per-type daily volume anomalies: z-score of each day's event count against that type's day distribution (decimal-exact sufficient statistics), |z| >= 2 flagged — the pipeline-health alarm query",
)
def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which days look wrong: per event type, each day's count scored
    against the type's mean/sample-stddev of daily counts; |z| >= 2
    rows surface — the ingest-monitoring readout that catches a dropped
    Scribe category or a double-delivered day.

    Scale plan: one (type, day) partial-agg'd shuffle builds the daily
    relation (types x days — tiny); mean/stddev come from DECIMAL n/
    Σx/Σx² sufficient statistics over it (order-independent, the
    grouped_ols_trend discipline — builtin stddev float-accumulates);
    the z expression and threshold are row-local over the tiny grid,
    and the |z| cut compares UNROUNDED doubles computed identically
    from identical integers on both engines."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    dec = F.col("n_events").cast("decimal(18,0)")
    stats = daily.groupBy(F.col("event_type").alias("s_type")).agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    nd, s, ss = F.col("nd"), F.col("s"), F.col("ss")
    z = (F.col("n_events") - s / nd) / F.sqrt((ss - s * s / nd) / (nd - 1))
    return (
        daily.join(
            F.broadcast(stats), daily.event_type == stats.s_type
        )
        .filter((nd >= 2) & ((ss - s * s / nd) > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2)
        .select("event_type", "day", "n_events", F.round("z", 6).alias("z"))
        .orderBy("event_type", "day")
    )


@register(
    "peak_concurrency_daily",
    """
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    pts AS (
      SELECT day, user_id, s AS t, 1 AS d FROM spans
      UNION ALL
      SELECT day, user_id, e AS t, -1 AS d FROM spans
    ),
    run AS (
      SELECT day,
             SUM(d) OVER (PARTITION BY day ORDER BY t, d DESC, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM pts
    )
    SELECT p.day,
           CAST(ns.n_sessions AS BIGINT) AS n_sessions,
           CAST(p.peak_concurrent AS BIGINT) AS peak_concurrent
    FROM (SELECT day, MAX(c) AS peak_concurrent FROM run GROUP BY day) p
    JOIN (SELECT day, COUNT(*) AS n_sessions FROM spans GROUP BY day) ns
      ON ns.day = p.day
    ORDER BY p.day
    """,
    note=(
        "sweep-line peak concurrency per day: user-day activity spans become +1/-1 boundary "
        "events, a day-partitioned running sum finds the maximum number of simultaneously "
        "active users — the capacity-planning readout (starts sort before ends at the same "
        "instant, so touching spans count as concurrent)"
    ),
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous activity per day via the classic sweep-line:
    each user-day's activity span [first event, last event] contributes
    a +1 at its start and a -1 at its end; the day's peak concurrency
    is the maximum of the running sum over boundary points.  Tie rule:
    at equal timestamps, starts (+1) sort before ends (-1) — touching
    spans count as concurrent — and user_id completes a TOTAL order, so
    the running sum is deterministic.

    Scale plan: spans come from one (user_id, day) partial-agg'd
    shuffle that collapses the raw event volume to TWO boundary rows
    per user-day BEFORE any window; the sweep window partitions by day,
    so each task orders only that day's boundary points (2 x daily
    active users — thousands, not the raw event billions), never the
    fact table; the final per-day aggregate is a tiny date-keyed
    reduce.  No global window, no single-partition exchange anywhere on
    the fact path."""
    ev = _t(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    pts = spans.select(
        "day", "user_id", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        spans.select("day", "user_id", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w_sweep = (
        Window.partitionBy("day")
        .orderBy(F.col("t"), F.col("d").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("day", F.sum("d").over(w_sweep).alias("c"))
    n_sessions = spans.groupBy("day").agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        run.groupBy("day")
        .agg(F.max("c").cast("long").alias("peak_concurrent"))
        .join(n_sessions, "day")
        .select(
            "day",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            "peak_concurrent",
        )
        .orderBy("day")
    )


@register(
    "last_touch_attribution",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
      FROM events
    ),
    purchases AS (
      SELECT CAST(ts AS DATE) AS day,
             value,
             CASE WHEN last_view_ts IS NOT NULL
                       AND ts - last_view_ts <= INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS attributed
      FROM ordered WHERE event_type = 'purchase'
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(attributed) AS BIGINT) AS n_attributed,
           (ROUND(CAST(SUM(attributed) AS DOUBLE) / COUNT(*), 6) + 0) AS attribution_rate,
           CAST(CAST(SUM(CASE WHEN attributed = 1
                         THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR) AS DOUBLE) AS attributed_value
    FROM purchases GROUP BY day ORDER BY day
    """,
    note=(
        "last-touch marketing attribution: each purchase credited to the user's most recent "
        "prior 'view' within a 7-day lookback (conditional last-ignorenulls over ONE user "
        "window); per-day attribution rate and decimal-exact attributed value"
    ),
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution over the raw event stream: carry each
    user's most recent 'view' timestamp forward (conditional
    last-ignorenulls — the resample_ffill discipline applied to a
    TYPE-FILTERED carry), then flag purchases whose carried view is
    within a 7-day lookback, and report per-day purchase counts,
    attribution rate, and decimal-exact attributed revenue.

    Scale plan: ONE user_id hash shuffle carries the whole query — the
    window orders each user's events once (the funnel discipline), the
    carry is rows-frame so ties resolve by (ts, event_id) total order;
    the per-day aggregate runs on the tiny date keyspace.  No as-of
    join, no second pass over events.  Value sums aggregate in DECIMAL
    (order-independent) and cast to double only for emission."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = ev.select(
        "ts",
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_ts"),
    )
    # microsecond-exact lookback: cast("long") floors to whole seconds,
    # so a purchase 7d+0.5s after its view would flip between engines;
    # unix_micros matches the oracle's INTERVAL comparison bit-for-bit
    attributed = F.when(
        F.col("last_view_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_view_ts"))
            <= 7 * 86400 * 1_000_000
        ),
        1,
    ).otherwise(0)
    purchases = ordered.where(F.col("event_type") == "purchase").select(
        F.col("ts").cast("date").alias("day"),
        "value",
        attributed.alias("attributed"),
    )
    return (
        purchases.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("attributed").cast("long").alias("n_attributed"),
            F.round(
                F.sum("attributed").cast("double") / F.count(F.lit(1)), 6
            ).alias("attribution_rate"),
            F.sum(
                F.when(
                    F.col("attributed") == 1, F.col("value").cast("decimal(18,3)")
                )
            )
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("day")
    )


@register(
    "repeat_purchase_interval",
    """
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) // 86400000000 AS gap_days
      FROM p
    )
    SELECT CAST(LEAST(gap_days, 10) AS BIGINT) AS gap_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           (ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM gaps WHERE gap_days IS NOT NULL), 6) + 0) AS share
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY gap_bucket ORDER BY gap_bucket
    """,
    note=(
        "repeat-purchase cadence: whole-day gaps between consecutive purchases per user "
        "(lag over ONE user window, integer micros floor-division), bucketed 0..10+ with "
        "corpus share — the retention-cadence readout"
    ),
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of days between a user's consecutive purchases: lag
    each purchase against the previous one per user, floor the gap to
    whole days (integer microsecond arithmetic — no float duration),
    cap the bucket at 10+, and report counts with corpus share.

    Scale plan: events filter to purchases BEFORE the shuffle (predicate
    pushed to the scan), then ONE user_id window computes the lag; the
    histogram aggregate has an 11-value key and the share denominator
    is a broadcast 1-row count.  First purchases (no predecessor) are
    excluded via IS NOT NULL in both engines."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        p.select(
            F.unix_micros(F.col("ts")).alias("us"),
            F.unix_micros(F.lag("ts").over(w)).alias("prev_us"),
        )
        .where(F.col("prev_us").isNotNull())
        # integer DIV, matching the oracle's // exactly — the module's
        # all-integer-micros discipline (gaps are non-negative, so DIV
        # and floor coincide and no float quotient ever exists)
        .select(F.expr("(us - prev_us) DIV 86400000000").alias("gap_days"))
    )
    tot = gaps.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        gaps.groupBy(F.least(F.col("gap_days"), F.lit(10)).cast("long").alias("gap_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
        .crossJoin(F.broadcast(tot))
        .select(
            "gap_bucket",
            "n_gaps",
            F.round(F.col("n_gaps").cast("double") / F.col("n_tot"), 6).alias("share"),
        )
        .orderBy("gap_bucket")
    )


@register(
    "error_rate_sli",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
      FROM events GROUP BY 1
    )
    SELECT day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_errors AS BIGINT) AS n_errors,
           (ROUND(CAST(n_errors AS DOUBLE) / n_events, 6) + 0) AS err_rate,
           (ROUND(AVG(CAST(n_errors AS DOUBLE) / n_events) OVER (
                 ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) + 0)
             AS err_rate_7d
    FROM daily ORDER BY day
    """,
    note=(
        "SLI error-rate series: daily error share plus the 7-day trailing average — the "
        "availability readout; the trailing window runs over the tiny daily grid (one row "
        "per day), never the event stream"
    ),
)
def error_rate_sli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-rate SLI with a 7-day trailing mean: one (day)-keyed
    partial-agg'd shuffle collapses events to the daily grid; the
    trailing window then orders ~365 rows/year — a deliberately global
    window over a BOUNDED post-aggregate relation (the
    cumulative_distinct_users precedent), never the raw events.  The
    trailing mean averages ≤7 doubles in frame order — identical
    sequential arithmetic on both engines."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    rate = F.col("n_errors").cast("double") / F.col("n_events")
    # constant key: daily aggregate rows only, not a fact path
    w7 = Window.partitionBy(F.col("n_events") % 1).orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_errors").cast("long").alias("n_errors"),
        F.round(rate, 6).alias("err_rate"),
        F.round(F.avg(rate).over(w7), 6).alias("err_rate_7d"),
    ).orderBy("day")


@register(
    "touch_depth",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    carried AS (
      SELECT event_type,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS touches
      FROM e
    ),
    purchases AS (
      SELECT LEAST(touches, 10) AS touch_bucket FROM carried
      WHERE event_type = 'purchase'
    )
    SELECT CAST(touch_bucket AS BIGINT) AS touch_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           (ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM purchases), 6) + 0) AS share
    FROM purchases GROUP BY touch_bucket ORDER BY touch_bucket
    """,
    note=(
        "multi-touch depth: views in the 7-day RANGE window before each purchase (value-"
        "bounded event-time frame over one user window), bucketed 0..10+ with share — how "
        "many touches a conversion takes, the attribution-model sizing input"
    ),
)
def touch_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many view-touches precede each purchase: a RANGE-framed
    window (value bounds in integer event-time microseconds — the
    event-time analog of a rows frame, and ties at equal timestamps
    are frame-equivalent by definition in both engines) counts views in
    the 7 days up to each event; purchases keep their count and roll
    into an 11-bucket histogram with corpus share.

    Scale plan: ONE user_id shuffle carries the window (the funnel /
    last_touch discipline); the frame is value-bounded so state per
    user is the 7-day slice, not the full history; the histogram key
    has 11 values and the share denominator is a broadcast 1-row
    count."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-604800000000, Window.currentRow)
    )
    carried = e.select(
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).over(w).alias("touches"),
    )
    purchases = carried.where(F.col("event_type") == "purchase").select(
        F.least(F.col("touches"), F.lit(10)).alias("touch_bucket")
    )
    tot = purchases.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        purchases.groupBy(F.col("touch_bucket").cast("long").alias("touch_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .crossJoin(F.broadcast(tot))
        .select(
            "touch_bucket",
            "n_purchases",
            F.round(F.col("n_purchases").cast("double") / F.col("n_tot"), 6).alias(
                "share"
            ),
        )
        .orderBy("touch_bucket")
    )


@register(
    "session_overlap_partners",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id, sid, MIN(ts) AS st, MAX(ts) + INTERVAL 30 MINUTES AS en
      FROM s GROUP BY user_id, sid
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub
      FROM sess a JOIN sess b
        ON a.st <= b.en AND b.st <= a.en AND a.user_id < b.user_id
    ),
    u AS (SELECT ua AS u, ub AS v FROM p UNION ALL SELECT ub, ua FROM p)
    SELECT u AS user_id,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_partners,
           CAST(COUNT(*) AS BIGINT) AS n_session_overlaps
    FROM u GROUP BY u ORDER BY user_id
    """,
    note=(
        "cross-user concurrent-session analysis via the BUCKETIZED interval-overlap "
        "join (time-grid equi-join + first-shared-cell exactly-once attribution — "
        "never a theta/cartesian): sessions = 30m-gap session windows; per user, how "
        "many distinct partners and session pairs overlapped them in time; oracle = "
        "the direct quadratic theta join DuckDB can afford single-node"
    ),
)
def session_overlap_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who is online WITH whom: every cross-user pair of time-overlapping
    sessions, aggregated to per-user partner counts.  The join is the
    interesting part — Spark has no native interval join, and the naive
    encodings are a cartesian filter or a BroadcastNestedLoop; the
    operator (joins.interval_overlap_join) turns the overlap predicate
    into a time-grid equi-join: intervals explode onto 1-hour cells
    (sessions span <= ~2 cells here; the operator raises loudly past 64),
    candidates come from the cell equi-join, and each true pair is
    counted at exactly ONE cell (the first both occupy:
    cell == greatest(start_cells)) so no dedup shuffle exists anywhere.

    Scale plan: the grid join shuffles on the cell key — time-local, so
    at 100 TB both session tables partition by day and the join never
    crosses day boundaries; candidate inflation over true pairs is
    bounded by same-cell near-misses (grid width ~ interval length).
    The oracle runs the O(n^2)-shaped theta join DuckDB's IEJoin
    handles single-node — retrieval equality IS the proof the grid
    decomposition loses nothing.  Reference anchor (public hadoop-20):
    mapred/join/CompositeInputFormat.java — equi-key-only map-side
    joins; the grid cell is how an interval predicate becomes an
    equi-key."""
    from hadoop_20_spark.operators.joins import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("st"),
            F.col("sw.end").alias("en"),
        )
    )
    pairs = interval_overlap_join(sess, sess, "st", "en", bucket_seconds=3600).filter(
        F.col("l_user_id") < F.col("r_user_id")
    )
    both = pairs.select(
        F.col("l_user_id").alias("u"), F.col("r_user_id").alias("v")
    ).unionAll(
        pairs.select(F.col("r_user_id").alias("u"), F.col("l_user_id").alias("v"))
    )
    return (
        both.groupBy(F.col("u").alias("user_id"))
        .agg(
            F.countDistinct("v").cast("long").alias("n_partners"),
            F.count(F.lit(1)).cast("long").alias("n_session_overlaps"),
        )
        .orderBy("user_id")
    )


@register(
    "gorilla_timestamp_compression",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS s, event_id FROM events
    ),
    d AS (
      SELECT user_id, s,
             s - lag(s) OVER w AS delta,
             (s - lag(s) OVER w) - (lag(s) OVER w - lag(s, 2) OVER w) AS dod
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    classed AS (
      SELECT CASE
               WHEN delta IS NULL THEN 'header_64'
               WHEN dod IS NULL THEN 'first_delta_64'
               WHEN dod = 0 THEN 'zero_1'
               WHEN dod BETWEEN -63 AND 64 THEN 'small_9'
               WHEN dod BETWEEN -255 AND 256 THEN 'medium_12'
               WHEN dod BETWEEN -2047 AND 2048 THEN 'large_16'
               ELSE 'raw_36'
             END AS bucket,
             CASE
               WHEN delta IS NULL THEN 64
               WHEN dod IS NULL THEN 64
               WHEN dod = 0 THEN 1
               WHEN dod BETWEEN -63 AND 64 THEN 9
               WHEN dod BETWEEN -255 AND 256 THEN 12
               WHEN dod BETWEEN -2047 AND 2048 THEN 16
               ELSE 36
             END AS bits
      FROM d
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
           CAST(SUM(bits) * 1000000 // (COUNT(*) * 64) AS BIGINT) AS ratio_ppm
    FROM classed GROUP BY bucket ORDER BY bucket
    """,
    note=(
        "Gorilla-style (Facebook 2015) delta-of-delta timestamp compression audit: "
        "per-user second-resolution timestamps classed into the paper's bit buckets "
        "(0 -> 1 bit, [-63,64] -> 9, [-255,256] -> 12, [-2047,2048] -> 16, else 36), "
        "per-bucket value counts and exact bit totals vs raw 64-bit storage — all "
        "integer arithmetic, so the compression ratio is hash-checked"
    ),
)
def gorilla_timestamp_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-series storage audit: how compressible is the event
    stream's time axis under delta-of-delta coding (Gorilla, the
    Facebook in-memory TSDB paper — the reference-era company's own
    answer to timestamp storage)?  Regular streams (fixed cadence)
    collapse to ~1 bit/sample; this corpus's irregular events spread
    across the 9/12/16/36-bit classes, and the per-bucket readout is
    the evidence a storage layer needs before choosing the codec.

    Scale plan: ONE user-partitioned window computes both lags (delta
    and delta-of-delta ride the same sort), classification is row-local
    CASE codegen, and the readout is a 7-value-key aggregate — the
    whole audit is one shuffle plus a bounded-domain one.  Integer
    seconds and integer ppm keep it engine-exact.  At 100 TB the
    window key (user/series id) is the natural series partition; no
    global ordering is ever needed.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) DIV 1000000").alias("s"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    d = ev.select(
        (F.col("s") - F.lag("s", 1).over(w)).alias("delta"),
        (
            (F.col("s") - F.lag("s", 1).over(w))
            - (F.lag("s", 1).over(w) - F.lag("s", 2).over(w))
        ).alias("dod"),
    )
    bucket = (
        F.when(F.col("delta").isNull(), "header_64")
        .when(F.col("dod").isNull(), "first_delta_64")
        .when(F.col("dod") == 0, "zero_1")
        .when(F.col("dod").between(-63, 64), "small_9")
        .when(F.col("dod").between(-255, 256), "medium_12")
        .when(F.col("dod").between(-2047, 2048), "large_16")
        .otherwise("raw_36")
    )
    bits = (
        F.when(F.col("delta").isNull(), 64)
        .when(F.col("dod").isNull(), 64)
        .when(F.col("dod") == 0, 1)
        .when(F.col("dod").between(-63, 64), 9)
        .when(F.col("dod").between(-255, 256), 12)
        .when(F.col("dod").between(-2047, 2048), 16)
        .otherwise(36)
    )
    return (
        d.select(bucket.alias("bucket"), bits.alias("bits"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("bits").cast("long").alias("total_bits"),
            (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
            F.expr("sum(bits) * 1000000 DIV (count(1) * 64)")
            .cast("long")
            .alias("ratio_ppm"),
        )
        .orderBy("bucket")
    )


@register(
    "interval_coalesce",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + 300 AS e,
             event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    ),
    per_user AS (
      SELECT user_id,
             COUNT(*) AS n_intervals,
             SUM(me - ms) AS covered_s
      FROM merged GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_intervals) AS BIGINT) AS total_intervals,
           CAST(SUM(covered_s) AS BIGINT) AS total_covered_s,
           CAST(MIN(n_intervals) AS BIGINT) AS min_intervals,
           CAST(MAX(n_intervals) AS BIGINT) AS max_intervals
    FROM per_user
    """,
    note=(
        "interval coalescing (merge overlapping/touching intervals): each event "
        "opens a 5-minute interval; islands detected by s > running-max(e) over "
        "ONE user-partitioned window, merged extents and exact covered seconds "
        "summarized — the union-of-intervals primitive under uptime/SLA math, "
        "ad frequency capping, and session stitching"
    ),
)
def interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals: overlapping/touching per-user intervals merge
    into maximal extents; the answer is exact covered time, which
    double-counts nothing.  The island rule (an interval starts a new
    island iff its start exceeds the running max of all previous ends)
    handles nested and chained overlaps that naive lag(e) comparison
    gets wrong — an interval can overlap an interval BEFORE its
    immediate predecessor.

    Scale plan: ONE user-partitioned window (running max-end, then a
    running island-id sum over the same sort) + two bounded aggregates
    — the sessionize/scd2 island discipline generalized from gaps to
    arbitrary overlap; integer seconds everywhere.  At 100 TB the
    window key is the series id; no global ordering exists anywhere.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) DIV 1000000").alias("s"),
        (F.expr("unix_micros(ts) DIV 1000000") + 300).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = ev.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    # order by the UNIQUE (s, event_id) — (s, e) ties (e is s+300) would
    # let the two engines order tied rows differently and split islands
    w2 = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = marked.select(
        "user_id", "s", "e", F.sum("new_island").over(w2).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_user = merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_s"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_intervals").cast("long").alias("total_intervals"),
        F.sum("covered_s").cast("long").alias("total_covered_s"),
        F.min("n_intervals").cast("long").alias("min_intervals"),
        F.max("n_intervals").cast("long").alias("max_intervals"),
    )


@register(
    "speculative_straggler_audit",
    """
    WITH task AS (
      SELECT event_type, user_id,
             COUNT(*) AS n_events,
             CAST((CAST(COUNT(*) AS HUGEINT) * 3600000000000000)
                  // (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) AS BIGINT)
               AS rate_ppm
      FROM events
      GROUP BY event_type, user_id
      HAVING COUNT(*) >= 2 AND epoch_us(MAX(ts)) > epoch_us(MIN(ts))
    ),
    job AS (
      SELECT event_type,
             COUNT(*) AS n_tasks,
             SUM(CAST(rate_ppm AS HUGEINT)) AS s1,
             SUM(CAST(rate_ppm AS HUGEINT) * rate_ppm) AS s2
      FROM task GROUP BY event_type
    ),
    flagged AS (
      SELECT t.event_type, t.user_id, t.n_events, t.rate_ppm,
             j.n_tasks,
             CAST(j.s1 // j.n_tasks AS BIGINT) AS job_mean_ppm,
             ((j.s1 - j.n_tasks * CAST(t.rate_ppm AS HUGEINT)) > 0
              AND (j.s1 - j.n_tasks * CAST(t.rate_ppm AS HUGEINT))
                  * (j.s1 - j.n_tasks * CAST(t.rate_ppm AS HUGEINT))
                  > j.n_tasks * j.s2 - j.s1 * j.s1) AS speculatable
      FROM task t JOIN job j USING (event_type)
    )
    SELECT event_type, user_id, n_events, rate_ppm, n_tasks, job_mean_ppm,
           job_mean_ppm - rate_ppm AS lag_ppm
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY rate_ppm, user_id) AS rn
          FROM flagged WHERE speculatable)
    WHERE rn <= 10
    ORDER BY event_type, rate_ppm, user_id
    """,
    note=(
        "speculative-execution candidate selection: task = (event_type, "
        "user_id) attempt, progress rate = events/hour in exact integer "
        "ppm; a task is speculatable when its rate is more than one "
        "population stddev below its job's mean, decided by the EXACT "
        "integer predicate (S1-n*r)^2 > n*S2-S1^2 (no sqrt, no float "
        "boundary) — slowest 10 candidates per job"
    ),
)
def speculative_straggler_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straggler detection, the speculative-execution scheduling readout
    (mapred/JobInProgress.java findSpeculativeTask / TaskInProgress.java
    hasSpeculativeTask — the reference flags tasks whose progress lags
    the job; the variance-aware rate criterion here is the LATE
    discipline, Zaharia et al. OSDI'08).  Jobs = event_type, task
    attempts = user_id streams, progress rate = events per hour over the
    attempt's observed span.

    Exactness: rate rides ONE exact integral division (events*3.6e15
    div elapsed_us = events/hour in ppm, DECIMAL(38,0) `div`), and the
    one-stddev rule is decided WITHOUT sqrt or float means: r below
    mean-stddev  <=>  S1-n*r > 0  AND  (S1-n*r)^2 > n*S2-S1^2, all in
    exact DECIMAL integer arithmetic over the per-job sufficient
    statistics (S1=sum r, S2=sum r^2) — the grouped_ols_trend
    discipline, so both engines flag the identical task set with zero
    last-ulp boundary risk.

    Scale plan: ONE fact-scale partial-agg shuffle at (event_type,
    user_id) task grain; job stats are a second aggregate over the task
    grain (n_jobs rows) broadcast back; the slowest-10-per-job window
    runs on the flagged subset with WindowGroupLimit pre-trim.

    Scale envelope, ENFORCED: the squared-deficit DECIMAL(38,0)
    products hold while n_tasks * max_rate_ppm < 1e19 (deficit <= S1 <=
    n*max_r, so every product is < 1e38).  Past that, Spark's non-ANSI
    decimal overflow would return NULL and the filter would silently
    DROP tasks from the flagged set, while DuckDB's HUGEINT raises —
    the one divergence class the gate cannot see (ADVICE r12).  So the
    predicate is wrapped in a per-job envelope check on (n_tasks,
    max rate) — two agg columns that themselves cannot overflow — that
    ``raise_error``s BEFORE the first overflowing product evaluates:
    same fail-loud discipline as the volume guards, zero extra jobs
    (the check rides the same broadcast join).  Remediation is in the
    message: drop the rate unit a decade (per-hour ppm -> per-hour
    per-mille); the unit is a literal in one place."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    task = (
        ev.groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "elapsed_us"
            ),
        )
        .filter((F.col("n_events") >= 2) & (F.col("elapsed_us") > 0))
        .withColumn(
            "rate_ppm",
            F.expr(
                "CAST((CAST(n_events AS DECIMAL(38,0)) * 3600000000000000) "
                "div elapsed_us AS BIGINT)"
            ),
        )
        .drop("elapsed_us")
    )
    job = task.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        F.sum(F.col("rate_ppm").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("rate_ppm").cast("decimal(38,0)") * F.col("rate_ppm")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
        F.max("rate_ppm").alias("max_r"),
    )
    deficit = F.col("s1") - F.col("n_tasks") * F.col("rate_ppm").cast(
        "decimal(38,0)"
    )
    # n_tasks (a COUNT) and max_r (a MAX) cannot overflow; their
    # DECIMAL(38,0) product maxes at ~8.5e37 < 1e38, so the envelope
    # check itself is exact.  CASE short-circuits: raise_error only
    # evaluates when the envelope is exceeded.
    envelope = (
        F.col("n_tasks").cast("decimal(38,0)")
        * F.col("max_r").cast("decimal(38,0)")
    )
    exact_predicate = F.col("deficit") * F.col("deficit") > F.col(
        "n_tasks"
    ) * F.col("s2") - F.col("s1") * F.col("s1")
    # The guard must be the FIRST conjunct: And short-circuits, so a
    # guard placed after `deficit > 0` would never evaluate on a row
    # whose deficit already overflowed to NULL (NULL left -> row
    # silently dropped, the exact failure being guarded against).
    guarded_check = F.when(
        envelope >= F.lit("10000000000000000000").cast("decimal(38,0)"),
        F.raise_error(
            F.concat(
                F.lit(
                    "speculative_straggler_audit: n_tasks * max_rate_ppm = "
                ),
                envelope.cast("string"),
                F.lit(
                    " >= 1e19 for job "
                ),
                F.col("event_type"),
                F.lit(
                    " — the DECIMAL(38,0) LATE predicate would overflow to "
                    "NULL and silently drop tasks from the flagged set.  "
                    "Drop the rate unit a decade (the 3600000000000000 "
                    "ppm-per-hour literal) and rerun."
                ),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    flagged = (
        task.join(F.broadcast(job), "event_type")
        .withColumn("deficit", deficit.cast("decimal(38,0)"))
        .filter(guarded_check & (F.col("deficit") > 0) & exact_predicate)
        .withColumn(
            "job_mean_ppm",
            F.expr("CAST(s1 div n_tasks AS BIGINT)"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("rate_ppm", "user_id")
    return (
        flagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "event_type",
            "user_id",
            "n_events",
            "rate_ppm",
            F.col("n_tasks").cast("long").alias("n_tasks"),
            "job_mean_ppm",
            (F.col("job_mean_ppm") - F.col("rate_ppm")).alias("lag_ppm"),
        )
        .orderBy("event_type", "rate_ppm", "user_id")
    )
