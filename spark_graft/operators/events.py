"""Event-stream queries, batch form: tumbling windows and gap-based
sessionization.

These are the oracle-checkable twins of the Structured Streaming
variants in spark_graft.streaming — same logical results, so streaming
correctness is established by equivalence to these (tested in
tests/test_streaming.py), and these are established against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_graft.functions import decimal_scaled_div_fx
from spark_graft.registry import query
from spark_graft.sources import table

SESSION_GAP_MIN = 30


@query(
    "stream_tumbling",
    oracle="""
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts+sums per event type. F.window
    buckets are epoch-aligned UTC — identical to DuckDB's time_bucket.
    In streaming form this is an incremental stateful agg with
    watermark-bounded state; the batch plan is a plain hash aggregate."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "stream_session",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the lag-flag +
    running-sum idiom — the reference's adjacent-key carry (R8,
    MapReduce.h:200-205) applied to time gaps. Partitioned by user_id:
    one shuffle, per-user sorts, no global ordering. Streaming twin uses
    session_window with a watermark (spark_graft.streaming)."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact timestamp-difference comparison (microsecond precision):
    # unix_timestamp() truncates to whole seconds and silently disagrees
    # with the oracle's INTERVAL compare for gaps within a second of the
    # threshold — the event data is microsecond-grained
    gap = F.col("ts") - F.lag("ts").over(w) > F.expr(
        f"INTERVAL {SESSION_GAP_MIN} MINUTES"
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | gap, 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_funnel",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t_view
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
            GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase
        FROM s1
        LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel (view -> click -> purchase): per user,
    the first view, the first click strictly AFTER that view, and the
    first purchase strictly after that click — order matters, so this is
    not three independent mins (a click preceding every view must not
    count). NULL at step k means the user fell out of the funnel there.

    Shape: a chain of filter -> groupBy(user_id) -> join(user_id)
    stages. EVERY stage keys on user_id, so after the first aggregate's
    Exchange the join and the next aggregate inherit that partitioning —
    Catalyst plans the chain with no re-shuffle of the user-keyed side,
    and the event_type filters push to the scan. That single-key
    pipeline is the 100 TB shape for any multi-step sequence analysis;
    AQE handles the power-law user (one hot key's events still spread
    over input splits, and each stage's aggregate is map-side partial
    first)."""
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return s1.join(s2, "user_id", "left").join(s3, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


@query(
    "ts_resample",
    oracle="""
        WITH c AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        ),
        s AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY user_id),
        h AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM s
        )
        SELECT h.user_id, h.hour,
               coalesce(c.n_events, 0) AS n_events,
               coalesce(c.sum_value, 0.0) AS sum_value
        FROM h LEFT JOIN c ON c.user_id = h.user_id AND c.hour = h.hour
    """,
)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-user HOURLY event
    counts and value sums, with every empty hour between a user's first
    and last activity emitted explicitly as a zero row — the dense
    regular grid that forecasting/feature pipelines require (a model
    reading sparse buckets silently treats 'no data' as 'no row', which
    is a different thing than zero).

    Shape: one aggregate to (user_id, hour) buckets; per-user spans from
    a second, much smaller aggregate over the buckets; the dense hour
    grid is a narrow sequence-explode of each span (INTERVAL arithmetic,
    no calendar table join); then a left join back on (user_id, hour).
    Every stage keys on user_id(+hour) — the bucket aggregate's Exchange
    satisfies the final join's distribution on the probe side, so
    Catalyst re-shuffles only the thin generated grid. Gap explosion is
    bounded by construction: a user's grid is span-hours rows regardless
    of raw event count, and users parallelize independently (at 100 TB
    the grid side is ~5 orders of magnitude smaller than the events
    scanned)."""
    ev = table(spark, sf_dir, "events")
    counts = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    spans = counts.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    hours = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return hours.join(counts, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "fill_forward",
    oracle="""
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'purchase' THEN value END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_purchase_value
        FROM events
    """,
)
def fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: annotate every event with the
    user's most recent purchase value at that moment (NULL until the
    first purchase) — the standard way sparse observations become a
    dense per-row feature ('customer's current basket value') without a
    point-in-time join.

    One window, one shuffle on user_id: last(..., ignorenulls=True)
    over a running frame streams each user's timeline once with O(1)
    state — the reference's prev-key carry (R8, MapReduce.h:200-205)
    generalized from 'previous key' to 'previous non-null observation'.
    The equivalent as-of self-join (join_asof's shape) would shuffle
    events twice; LOCF as a window is strictly cheaper and the value is
    carried verbatim (no arithmetic), so the hash-match is exact on raw
    doubles."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_value"),
    )


Z_THRESHOLD = 2.0


@query(
    "ts_anomaly",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type, hour, n_events,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   CAST(sum(n_events) OVER w AS BIGINT) AS s,
                   CAST(sum(n_events * n_events) OVER w AS BIGINT) AS ss
            FROM hourly
            WINDOW w AS (PARTITION BY event_type)
        )
        SELECT event_type, hour, n_events,
               round((n_events - s / n)
                     / sqrt((n * ss - s * s) / (n * (n - 1.0))), 4) AS z
        FROM stats
        WHERE n > 1 AND n * ss > s * s
          AND abs((n_events - s / n)
                  / sqrt((n * ss - s * s) / (n * (n - 1.0)))) > {Z_THRESHOLD}
    """,
)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection on event-rate time series: hours whose
    event count sits more than {Z_THRESHOLD} sample standard deviations
    from that event type's hourly mean.

    The statistics are DERIVED FROM INTEGER SUMS (n, Σx, Σx²) so the
    mean/variance are bit-identical across engines and partitionings —
    stddev_samp() cannot be hash-gated (its partial-merge order changes
    the low bits), but (n·Σx² − (Σx)²) / (n·(n−1)) from exact bigint
    accumulators can, and the same property makes the detector
    reproducible on a 1000-executor run. One shuffle: the hourly
    aggregate keys on (event_type, hour); the stats window re-keys on
    event_type's prefix, and the per-type series a window task holds is
    bounded by the calendar, not the event volume."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    stats = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")) / (
        F.col("n") * (F.col("n") - F.lit(1.0))
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        stats.filter(
            (F.col("n") > 1)
            & (F.col("n") * F.col("ss") > F.col("s") * F.col("s"))
            & (F.abs(z) > Z_THRESHOLD)
        )
        .select("event_type", "hour", "n_events", F.round(z, 4).alias("z"))
    )


@query(
    "events_retention",
    oracle="""
        WITH firstday AS (
            SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
               count(*) AS n_users
        FROM act a JOIN firstday f USING (user_id)
        GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day (their
    cohort), counted on every later day they return — the (cohort_day,
    day_offset) -> n_users matrix behind every retention curve.

    Every stage keys on user_id until the final tiny aggregate: cohort
    assignment is a groupBy(user), the distinct activity grid is a
    groupBy(user, day) sharing the same key prefix, and the join
    re-uses that partitioning — the only data movement after the first
    Exchange is the final (cohort, offset) aggregate whose cardinality
    is days², not users. The matrix never pivots wide here: long form
    is what both a plotting layer and an incremental refresh want."""
    ev = table(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    act = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    return (
        act.join(firstday, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


PATH_TOP_K = 10


@query(
    "events_paths",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type, 1) OVER w AS t1,
                   lead(event_type, 2) OVER w AS t2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_type || ' > ' || t1 || ' > ' || t2 AS path,
               count(*) AS n
        FROM seq WHERE t2 IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT {PATH_TOP_K}
    """,
)
def events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the {PATH_TOP_K} most common 3-step event sequences
    across all user timelines (consecutive by time, within one user) —
    the 'what do users actually do' query behind funnel design.

    One user-keyed window (two leads share one sort), then a global
    count with map-side partials and TakeOrderedAndProject for the
    top-k. The window is the only per-user state and it carries exactly
    two lookahead rows — the reference's R8 prev-key carry run
    forwards. No sessionization boundary here by design (sequences
    spanning sessions count); compose with stream_session's session_id
    in the partition key to cut at session edges."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(F.col("t2").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(PATH_TOP_K)
    )


SLIDE_WIDTH_MIN = 10
SLIDE_STEP_MIN = 5


@query(
    "stream_sliding",
    oracle=f"""
        WITH w AS (
            SELECT unnest(generate_series(
                       time_bucket(INTERVAL '{SLIDE_STEP_MIN} minutes', ts)
                           - INTERVAL '{SLIDE_WIDTH_MIN - SLIDE_STEP_MIN} minutes',
                       time_bucket(INTERVAL '{SLIDE_STEP_MIN} minutes', ts),
                       INTERVAL '{SLIDE_STEP_MIN} minutes')) AS window_start,
                   event_type, value
            FROM events
        )
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM w GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING (hopping) windows: {SLIDE_WIDTH_MIN}-minute windows every
    {SLIDE_STEP_MIN} minutes, so each event lands in
    {SLIDE_WIDTH_MIN // SLIDE_STEP_MIN} overlapping windows — the
    smoothed-rate view monitoring dashboards want, where a tumbling
    window's bucket edges would alias spikes.

    F.window with a slide duration plans as one Expand (×windows/event)
    feeding the same partial-then-final aggregate as the tumbling form —
    overlap costs a constant row-amplification before map-side
    collapse, never a second shuffle. The oracle derives each event's
    window starts arithmetically (epoch-aligned, like Spark's). The
    streaming twin is the same expression under a watermark with state
    per (window, type) evicted as the watermark passes window end."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(
                "ts", f"{SLIDE_WIDTH_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


@query(
    "win_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        isl AS (
            SELECT user_id,
                   CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT)
                       - row_number() OVER (PARTITION BY user_id ORDER BY day)
                       AS island
            FROM days
        ),
        streaks AS (
            SELECT user_id, island, count(*) AS len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(max(len) AS BIGINT) AS longest_streak,
               count(*) AS n_streaks
        FROM streaks GROUP BY user_id
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    calendar days and how many distinct runs they have — the streak
    analytics behind engagement scoring, built on the classic
    date-minus-row_number trick (consecutive days share a constant
    difference, so the difference IS the island id; any gap shifts it).

    ONE Exchange total (plan-pinned): collect_set(day) aggregates with
    map-side partials on user_id — the same shuffle bytes as a
    distinct — and the streak scan is then a narrow HOF fold over each
    user's sorted day array (state: current run, best run, previous
    day, streak count). Per-user array size is bounded by the
    CALENDAR, not event volume, so the fold is safe at any scale. The
    row_number-difference form (the oracle) needs a second exchange
    because distinct must hash on (user, day) before the window
    re-keys on user. Integer day arithmetic (epoch-anchored datediff),
    exact in both engines. Distinct from stream_session: sessions cut
    on TIME gaps within a day; islands cut on CALENDAR-day
    continuity."""
    ev = table(spark, sf_dir, "events")
    day_int = F.datediff("ts", F.lit("2024-01-01").cast("date")).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set(day_int)).alias("ds")
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("cur"),
        zero.alias("best"),
        F.lit(None).cast("long").alias("prev"),
        zero.alias("n"),
    )

    def step(acc, d):
        new_run = acc["prev"].isNull() | (d - acc["prev"] > 1)
        cur = F.when(new_run, F.lit(1).cast("long")).otherwise(acc["cur"] + 1)
        return F.struct(
            cur.alias("cur"),
            F.greatest(acc["best"], cur).alias("best"),
            d.alias("prev"),
            (acc["n"] + F.when(new_run, 1).otherwise(0)).alias("n"),
        )

    folded = per_user.select(
        "user_id", F.aggregate("ds", init, step).alias("s")
    )
    return folded.select(
        "user_id",
        F.col("s.best").alias("longest_streak"),
        F.col("s.n").alias("n_streaks"),
    )


# MATCH_RECOGNIZE / CEP pattern: view, one-or-more clicks, then a
# purchase — contiguous in the per-user (ts, event_id) order. The
# symbol alphabet is one char per event_type, so the pattern language
# is plain regex over the user's timeline string.
CEP_PATTERN = "vc+p"


@query(
    "events_pattern",
    oracle=f"""
        WITH seq AS (
            SELECT user_id,
                   string_agg(CASE event_type
                                  WHEN 'view' THEN 'v'
                                  WHEN 'click' THEN 'c'
                                  WHEN 'purchase' THEN 'p'
                                  WHEN 'signup' THEN 's'
                                  ELSE 'e' END,
                              -- NULLS FIRST pinned: Spark's array_sort
                              -- over struct(ts, event_id, sym) places a
                              -- NULL ts field first, DuckDB's ORDER BY
                              -- defaults NULLS LAST (same pin as the
                              -- win_dist r10 fix)
                              '' ORDER BY ts NULLS FIRST, event_id) AS s
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT user_id, regexp_extract_all(s, '{CEP_PATTERN}', 0) AS ms
            FROM seq
        )
        SELECT user_id,
               CAST(len(ms) AS BIGINT) AS n_matches,
               CAST(coalesce(list_sum(list_transform(ms, x -> len(x))), 0)
                    AS BIGINT) AS n_events_matched,
               CAST(CASE WHEN len(ms) > 0 THEN len(ms[1]) ELSE 0 END
                    AS BIGINT) AS first_match_len,
               CAST(coalesce(list_max(list_transform(ms, x -> len(x) - 2)), 0)
                    AS BIGINT) AS max_click_run
        FROM m
    """,
)
def events_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection (the Flink-CEP / SQL:2016
    row-pattern capability): per user, find every non-overlapping
    contiguous run matching view -> click+ -> purchase in (ts, event_id)
    order, and report match count, total events consumed, the first
    match's length, and the longest click-run inside any match. Unlike
    events_funnel (first-occurrence steps, gaps allowed), the pattern
    here is CONTIGUOUS — an interleaved signup/error breaks it — which
    is the semantics MATCH_RECOGNIZE's default AFTER MATCH SKIP PAST
    LAST ROW gives.

    Spark-first shape: one shuffle (groupBy user_id), each timeline
    collapsed to a symbol string via array_sort(collect_list(struct)) —
    event_id breaks timestamp ties deterministically — then the match
    itself is a single codegen'd regexp_extract_all: leftmost,
    non-overlapping, greedy in BOTH engines, and for this pattern class
    (each symbol class disjoint from its successor's) greedy == longest,
    so Java regex and DuckDB's RE2 provably agree. Per-user state is the
    timeline length — the same bound any CEP engine carries; compose
    with stream_session's session_id in the groupBy key to cap it at
    session length at 100 TB. No window-over-single-partition, no
    Python: the fold and the regex are both whole-stage-codegen
    expressions."""
    ev = table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", "ts", "event_id", sym.alias("sym"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "sym"))),
                    lambda r: r["sym"],
                ),
                "",
            ).alias("s")
        )
    )
    ms = F.regexp_extract_all("s", F.lit(CEP_PATTERN), 0)
    return seq.select(
        "user_id",
        F.size(ms).cast("bigint").alias("n_matches"),
        F.aggregate(
            F.transform(ms, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("n_events_matched"),
        F.when(F.size(ms) > 0, F.length(F.element_at(ms, 1)))
        .otherwise(0)
        .cast("bigint")
        .alias("first_match_len"),
        F.coalesce(
            F.array_max(F.transform(ms, lambda x: F.length(x) - 2)), F.lit(0)
        )
        .cast("bigint")
        .alias("max_click_run"),
    )


ATTRIB_WINDOW_MIN = 30  # last-touch lookback, matches the streaming join


@query(
    "events_attribution",
    oracle=f"""
        WITH p AS (
            SELECT event_id AS purchase_id, user_id, ts AS pts
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        m AS (
            SELECT p.purchase_id, c.click_id, c.cts,
                   row_number() OVER (PARTITION BY p.purchase_id
                                      ORDER BY c.cts DESC, c.click_id DESC) AS rk
            FROM p JOIN c
              ON c.user_id = p.user_id
             AND c.cts <= p.pts
             AND p.pts - c.cts <= INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
        )
        SELECT p.purchase_id, p.user_id, p.pts AS purchase_ts,
               m.click_id AS last_click_id,
               CAST((epoch_us(p.pts) - epoch_us(m.cts)) // 1000000 AS BIGINT)
                   AS secs_to_convert
        FROM p
        LEFT JOIN (SELECT purchase_id, click_id, cts FROM m WHERE rk = 1) m
          ON m.purchase_id = p.purchase_id
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution — the batch-declared twin of the
    watermarked stream-stream join (spark_graft.streaming
    attribution_join_stream): every purchase attributed to the user's
    most recent click within the preceding {ATTRIB_WINDOW_MIN} minutes
    (ties broken by click_id), NULL when unattributed, plus the exact
    seconds-to-convert. The streaming variant emits ALL in-window
    click-purchase pairs under two watermarks; this picks the marketing
    answer (the last touch) and carries the DuckDB oracle.

    Scale shape: the same interval-binning trick as join_theta_range —
    both sides get a {ATTRIB_WINDOW_MIN}-minute coarse bucket on the
    equi key, the purchase side explodes to its own and the PREVIOUS
    bucket (a qualifying click can only live in those two), so the hash
    join compares temporally-adjacent events instead of
    O(per-user-clicks x per-user-purchases). A click's bucket equals
    exactly one of the two probes, so no pair is generated twice and no
    distinct is needed. Last-touch is max(struct(cts, cid)) inside the
    same aggregation — never a window over all pairs — and the final
    LEFT join re-admits unattributed purchases. Exact integer
    seconds via unix_micros (epoch_us in DuckDB): no float time math."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("cts"),
    )
    win_s = ATTRIB_WINDOW_MIN * 60
    pb = F.floor(F.unix_timestamp("pts") / win_s)
    cb = F.floor(F.unix_timestamp("cts") / win_s)
    p_ex = p.select(
        "purchase_id", "user_id", "pts", F.explode(F.array(pb, pb - 1)).alias("bkt")
    )
    pairs = p_ex.alias("a").join(
        c.withColumn("bkt", cb).alias("b"),
        (F.col("a.user_id") == F.col("b.c_user_id"))
        & (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("b.cts") <= F.col("a.pts"))
        & (
            F.col("a.pts") - F.col("b.cts")
            <= F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
    )
    last = (
        pairs.groupBy("purchase_id")
        .agg(F.max(F.struct("cts", "click_id")).alias("lc"))
        .select("purchase_id", F.col("lc.click_id").alias("last_click_id"), F.col("lc.cts").alias("lcts"))
    )
    return p.join(last, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.col("pts").alias("purchase_ts"),
        "last_click_id",
        F.expr("(unix_micros(pts) - unix_micros(lcts)) div 1000000")
        .cast("bigint")
        .alias("secs_to_convert"),
    )


# --------------------------------------------------------- user features


@query(
    "events_user_features",
    oracle=f"""
        WITH base AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
                       AS active_days,
                   CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) + 1
                       AS active_span_days,
                   CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                        AS BIGINT) AS n_purchases,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY user_id
        ),
        lagd AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w
                                > INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions
            FROM lagd GROUP BY user_id
        ),
        s1 AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t_view
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
            GROUP BY e.user_id
        )
        SELECT b.user_id, b.n_events, s.n_sessions, b.active_days,
               b.active_span_days,
               CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                         WHEN s2.user_id IS NOT NULL THEN 2
                         WHEN s1.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS funnel_stage,
               b.n_purchases, b.total_value
        FROM base b
        JOIN sess s ON s.user_id = b.user_id
        LEFT JOIN s1 ON s1.user_id = b.user_id
        LEFT JOIN s2 ON s2.user_id = b.user_id
        LEFT JOIN s3 ON s3.user_id = b.user_id
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user FEATURE ROLLUP — the feature-engineering table a
    training pipeline derives from raw event logs (engagement scoring,
    churn/conversion labels, curriculum weighting): event volume,
    {SESSION_GAP_MIN}-minute-gap session count, active-day count and
    calendar span, the ordered view->click->purchase funnel stage
    reached, purchase count, and exact-decimal total value — one row
    per user.

    ONE Exchange total (plan-pinned): every derivation keys on
    user_id, so the lag window (session breaks), the two stacked
    whole-partition windows that carry the ordered-funnel firsts onto
    each row (first view, then first click AFTER that view — the
    ordering means three independent mins would be WRONG, see
    events_funnel), and the final aggregate all inherit one
    hashpartitioning(user_id). The oracle computes the same features
    as separate CTE chains and joins them — two independent shapes,
    one hash. Per-user window cost is activity-bounded (the same
    contract as the batch sessionizer); active_days aggregates a
    calendar-bounded day set, not raw timestamps. At 100 TB this is
    the query you materialize nightly keyed exactly like its consumers
    (user-bucketed), so the single shuffle amortizes across every
    downstream feature join."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")

    prev = F.lag("ts").over(wlag)
    # microsecond-exact interval compare, NOT cast("long") second
    # truncation — the same trap stream_session's comment documents: a
    # gap inside one second of the threshold silently disagrees with
    # the oracle's INTERVAL compare (caught by the sf1 sweep, where
    # sub-second timestamps are dense)
    is_new = F.when(
        prev.isNull()
        | (
            F.col("ts") - prev
            > F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
        ),
        1,
    ).otherwise(0)
    e1 = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        is_new.alias("is_new"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .over(wall)
        .alias("_fv"),
    )
    e2 = e1.withColumn(
        "_fc",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("_fv")),
                F.col("ts"),
            )
        ).over(wall),
    )
    agg = e2.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_new").cast("bigint").alias("n_sessions"),
        F.size(
            F.collect_set(F.datediff("ts", F.lit("2024-01-01").cast("date")))
        ).cast("bigint").alias("active_days"),
        (F.datediff(F.max("ts"), F.min("ts")) + 1).cast("bigint").alias(
            "active_span_days"
        ),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("_fc")),
                1,
            )
        ).alias("_p"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("_fv")), 1
            )
        ).alias("_c"),
        F.max(F.when(F.col("event_type") == "view", 1)).alias("_v"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
    )
    stage = (
        F.when(F.col("_p") == 1, 3)
        .when(F.col("_c") == 1, 2)
        .when(F.col("_v") == 1, 1)
        .otherwise(0)
        .cast("int")
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_sessions",
        "active_days",
        "active_span_days",
        stage.alias("funnel_stage"),
        "n_purchases",
        "total_value",
    )


# --------------------------------------------------------- events_transitions

TRANSITION_SCALE = 1_000_000  # fixed-point scale for transition probabilities


@query(
    "events_transitions",
    oracle=f"""
        WITH seq AS (
            SELECT event_type AS cur_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        pairs AS (
            SELECT cur_type, next_type, count(*) AS n_transitions
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY cur_type, next_type
        )
        SELECT cur_type, next_type, n_transitions,
               (n_transitions * {TRANSITION_SCALE})
               // CAST(sum(n_transitions) OVER (PARTITION BY cur_type) AS BIGINT)
                   AS prob_fx
        FROM pairs
    """,
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral Markov chain: the full event-type transition
    matrix P(next | current) over every user's event-time-ordered
    sequence — the model behind propensity scoring, synthetic-session
    generation, and funnel-leak diagnosis. lm_next_token is the corpus
    TEXT bigram head (top-3 per token over one global sequence); this is
    the ENTITY-sequence form: transitions never cross user boundaries
    (lead() is partitioned), and the whole matrix is emitted, not a
    top-k. Probabilities are fixed-point: n * SCALE div row-total —
    exact int64 in both engines.

    Scale shape: the lead() window rides the per-user (ts, event_id)
    sort — user keys are the well-distributed shuffle this family
    already uses (fill_forward's contract) — then the pair aggregation
    collapses 100 TB of events to at most |alphabet|^2 rows with
    map-side partials, and the row-total window runs over THAT
    bounded-cardinality table (the mixture_weights justification:
    input bounded by the domain alphabet, not the data)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("cur_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("cur_type"))
    # scaled numerator in decimal(38,0): one hot transition pair can
    # accumulate > 9.2e12 rows at 100 TB of events, where a plain int64
    # n * 10^6 wraps negative (the mixture-monitor lesson, code-review
    # r14); floor-div of nonneg decimals == int64 div in-range
    return pairs.select(
        "cur_type",
        "next_type",
        "n_transitions",
        row_total.alias("_tot"),
    ).select(
        "cur_type",
        "next_type",
        "n_transitions",
        decimal_scaled_div_fx(
            "n_transitions", TRANSITION_SCALE, "_tot"
        ).alias("prob_fx"),
    )


# ------------------------------------------------------------------- ts_ewma

EWMA_DEPTH = 8  # lag terms; alpha = 1/2 so weights are exact powers of two


def _ewma_terms_sql() -> tuple[str, str]:
    """(numerator, denominator) SQL fragments: an 8-term lag chain with
    weights 2^-k. The addition order is the EXPRESSION TREE (k = 0..7),
    identical in both engines, and each term is value / 2^k — scaling
    by a power of two, which is EXACT in IEEE-754 — so the whole EWMA
    is bit-deterministic without any transcendental."""
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w / {1 << k}, 0.0)"
        for k in range(EWMA_DEPTH)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NOT NULL "
        f"THEN 1.0 / {1 << k} ELSE 0.0 END)"
        for k in range(EWMA_DEPTH)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms_sql()


@query(
    "ts_ewma",
    oracle=f"""
        WITH ev AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN isnan(value) THEN NULL ELSE value END AS value
            FROM events
        )
        SELECT event_id, user_id, ts, value,
               round(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values (alpha = 1/2, depth 8 = EWMA_DEPTH) — the standard smoothing
    primitive behind rate limiting, trend features, and anomaly
    baselines, annotated per event like fill_forward. win_running is
    the uniform-weight cumulative sum; this is the recency-weighted
    form.

    Bit-determinism contract: alpha = 1/2 makes every weight an exact
    power of two, each term is value / 2^k (exact IEEE scaling), and
    the sum's ADDITION ORDER is the expression tree itself (k = 0..7) —
    identical in both engines, unlike a SQL SUM over join rows whose
    order is engine-chosen. Sequence starts renormalize over the
    available terms (missing lags contribute 0 to both numerator and
    denominator), so the first event's EWMA is its own value.

    NULL/NaN convention (shared with ewma_stream, per ADVICE r14): a
    genuine NaN value is normalized to NULL at ingest on BOTH engines
    (pandas float64 erases the NULL/NaN distinction inside the
    stream's state fold, so NULL is the one representation the twins
    can agree on); the passthrough `value` column re-emits that NULL.
    NULL/NaN slots still shift the window but contribute 0 to both
    sums. An all-NULL window yields ewma = 0.0/0.0 = NaN in both
    engines.

    Scale shape: ONE window on the family's per-user (ts, event_id)
    sort; all EWMA_DEPTH lag() calls share the single window spec, so
    Spark plans one Window operator with one Exchange — O(depth) state
    per user timeline, a pure streaming pass."""
    ev = table(spark, sf_dir, "events").withColumn(
        "value", F.nanvl(F.col("value"), F.lit(None).cast("double"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k in range(EWMA_DEPTH):
        v = F.lag("value", k).over(w) if k else F.col("value")
        term = F.coalesce(v / F.lit(float(1 << k)), F.lit(0.0))
        avail = F.when(v.isNotNull(), F.lit(1.0 / (1 << k))).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


# ---------------------------------------------------------------- events_rfm

RFM_BINS = 5  # quintile scores 1..5 per dimension


def _rfm_quint_sql(metric: str) -> str:
    """DuckDB CTE pair: distinct-value histogram of `metric` over pu +
    exact integer ceil-quantile score (the pipeline_curriculum
    contract)."""
    return f"""
        h_{metric} AS (SELECT {metric} AS v, count(*) AS c FROM pu GROUP BY 1),
        s_{metric} AS (
            SELECT v,
                   ({RFM_BINS} * CAST(sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    + CAST(sum(c) OVER () AS BIGINT) - 1)
                   // CAST(sum(c) OVER () AS BIGINT) AS stage
            FROM h_{metric}
        )"""


@query(
    "events_rfm",
    oracle=f"""
        WITH anchor AS (SELECT CAST(max(ts) AS DATE) AS a FROM events),
        pu AS (
            SELECT user_id,
                   datediff('day', CAST(max(ts) AS DATE), (SELECT a FROM anchor))
                       AS r_days,
                   count(*) AS freq,
                   CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase'
                                 AND isfinite(value) AND abs(value) < 1e12
                            THEN CAST(value AS DECIMAL(18,6)) END), 0) * 100)
                        AS BIGINT) AS mon_cents
            FROM events GROUP BY user_id
        ),
        {_rfm_quint_sql("r_days")},
        {_rfm_quint_sql("freq")},
        {_rfm_quint_sql("mon_cents")}
        SELECT pu.user_id, pu.r_days, pu.freq, pu.mon_cents,
               ({RFM_BINS} + 1) - sr.stage AS r_score,
               sf.stage AS f_score,
               sm.stage AS m_score,
               (({RFM_BINS} + 1) - sr.stage) * 100 + sf.stage * 10 + sm.stage
                   AS rfm_segment
        FROM pu
        JOIN s_r_days sr ON sr.v = pu.r_days
        JOIN s_freq sf ON sf.v = pu.freq
        JOIN s_mon_cents sm ON sm.v = pu.mon_cents
    """,
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic behavioral-analytics operator:
    each user scored 1..5 on Recency (days since last event, against
    the corpus max as the deterministic anchor), Frequency (event
    count), and Monetary (purchase cents), with the three-digit
    rfm_segment (555 = best). Scores are exact integer ceil-quantiles
    ((B*cum + n - 1) div n over the metric's distinct-value histogram
    — pipeline_curriculum's contract, applied three times); recency is
    polarity-flipped (6 - stage) so 5 always means "best".

    Scale shape: ONE corpus-scale groupBy(user_id) with map-side
    partials; each score map is a histogram-then-window over DISTINCT
    metric values (r_days bounded by corpus age in days, freq by the
    max per-user count, mon_cents by max per-user spend — all
    range-bounded business quantities, the agg_weighted_quantile
    justification) joined back as a broadcast dimension. Monetary is
    summed as DECIMAL(18,6) then floor()'d to cents on BOTH engines
    (the r15 agg_weighted_quantile lesson: Spark's decimal->bigint
    cast truncates, DuckDB's rounds — floor first makes them
    identical). Non-castable purchase values — NaN, +/-inf, and
    |value| >= 1e12 (DECIMAL(18,6)'s range) — are SKIPPED by an
    explicit guard on both engines: DuckDB's decimal cast raises on
    all of them while Spark's behavior depends on ANSI mode, so
    neither engine's implicit handling can be the contract
    (code-review r15, both passes)."""
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("a"))
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("_last"),
            F.count(F.lit(1)).alias("freq"),
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("event_type") == "purchase")
                            # explicit finite/in-range gate on BOTH
                            # engines: NaN/inf/1e12+ make DuckDB's
                            # decimal cast RAISE while Spark's yields
                            # NULL (non-ANSI) or raises (ANSI) — the
                            # guard skips the row identically
                            # everywhere. ~isnan is stated explicitly
                            # (ADVICE r15) so the finite-value contract
                            # mirrors the oracle's isfinite() instead
                            # of leaning on Spark's NaN-orders-above-
                            # everything comparison semantics.
                            & ~F.isnan("value")
                            & (F.abs("value") < F.lit(1e12)),
                            F.col("value").cast("decimal(18,6)"),
                        )
                    ),
                    F.lit(0),
                )
                * 100
            )
            .cast("bigint")
            .alias("mon_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("a", "_last").alias("r_days"),
            "freq",
            "mon_cents",
        )
        # pu is referenced FOUR times (output + three histograms);
        # without materialization each reference re-scans events and
        # re-runs the user aggregate — 4x the corpus-dominant cost at
        # 100 TB. localCheckpoint cuts lineage so events are read once
        # and the histograms read the n_users-row table (the
        # dedup_containment groups-table precedent), plan-pinned to one
        # user_id Exchange.
        .localCheckpoint()
    )

    wcum = lambda c: Window.orderBy(c).rowsBetween(  # noqa: E731
        Window.unboundedPreceding, Window.currentRow
    )

    def quint(col: str) -> DataFrame:
        hist = pu.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return hist.select(
            col,
            F.sum("c").over(wcum(col)).alias("cum"),
            F.sum("c").over(Window.partitionBy()).alias("tot"),
        ).select(
            col,
            F.expr(f"({RFM_BINS} * cum + tot - 1) div tot").alias(
                f"{col}_stage"
            ),
        )

    out = (
        pu.join(F.broadcast(quint("r_days")), "r_days")
        .join(F.broadcast(quint("freq")), "freq")
        .join(F.broadcast(quint("mon_cents")), "mon_cents")
    )
    r_score = F.lit(RFM_BINS + 1) - F.col("r_days_stage")
    return out.select(
        "user_id",
        "r_days",
        "freq",
        "mon_cents",
        r_score.alias("r_score"),
        F.col("freq_stage").alias("f_score"),
        F.col("mon_cents_stage").alias("m_score"),
        (r_score * 100 + F.col("freq_stage") * 10 + F.col("mon_cents_stage")).alias(
            "rfm_segment"
        ),
    )
