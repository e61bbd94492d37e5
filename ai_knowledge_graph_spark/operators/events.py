"""Event-stream analytics operators: as-of join, sessionization, windows.

The build brief names as-of joins and range/window operations as the custom
operators Spark's DataFrame API lacks as primitives; the reference engine has
no event layer at all (its inputs are whole text files, main.py:283-284), so
these are the from-scratch event-side surface over the driver's ``events``
table (event_id, ts, user_id, event_type, value, props).

All three operators are single-shuffle shapes keyed by the entity id:

  asof_join        union-tag trick: one shuffle by key, one per-key ordered
                   window carrying last-known right-side payload forward —
                   the kdb/Flink temporal-join shape, linear in rows
  sessionize       lag + running-sum windows per key (gap sessionization)
  session_stats    hash agg over (key, session)

Per-key windows sort within each key partition; at web scale the key is a
user/entity id with bounded per-key cardinality (hot keys are bounded by a
user's own event count, not corpus size), which is exactly when per-key
windows are the right plan. For a key-free global as-of, range-bucket the
timestamp instead (see time-bucket note in asof_join docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("event_id",),
    tiebreak_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right.ts <= left.ts`` for the same key (inclusive, like DuckDB ASOF).

    Implementation is the union-tag trick, NOT a theta-join: tag right rows
    0 and left rows 1, union, then one window per key ordered by
    (ts, tag, tiebreak) carrying ``last(payload, ignorenulls=True)``
    forward. Cost is one shuffle of |L|+|R| rows plus a per-key sort —
    linear, no per-left-row candidate scan, no range condition the
    optimizer would turn into a broadcast-nested-loop. Left rows with no
    preceding right row keep nulls (left-outer semantics).

    Ties: right rows sharing (key, ts) are resolved by ``tiebreak_col``
    (max wins); required for determinism when right timestamps may repeat.
    For a key-free global as-of at scale, add a coarse time-bucket column
    to both sides and use it as ``key_col`` (with the previous bucket's
    tail replicated), keeping the same single-shuffle shape.
    """
    tag = F.lit(1)
    lhs = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        tag.alias("_tag"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
        F.struct(*left.columns).alias("_row"),
    )
    rhs = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).cast("long").alias("_tie"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_tag"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "_tag",
        "_row",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).select(
        "_row.*", *[f"{prefix}{c}" for c in payload_cols]
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append ``session_id``: gap-based sessions per key (new session when
    the inter-event gap exceeds ``gap_seconds``).

    Two stacked windows over the same (key, ts, order) sort — Catalyst
    plans them in ONE shuffle + one per-key sort: lag() marks session
    starts, a running sum numbers them. session_id = "<key>-<idx>" is
    stable under re-partitioning (derived from data, not task ids).
    Second-resolution gap arithmetic (unix_timestamp floor) keeps the SQL
    oracle byte-identical.
    """
    order = (F.col(ts_col), F.col(order_col))
    w_lag = Window.partitionBy(key_col).orderBy(*order)
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.unix_timestamp(ts_col)
    prev_sec = F.lag(sec).over(w_lag)
    new_session = F.when(
        prev_sec.isNull() | ((sec - prev_sec) > gap_seconds), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.concat_ws(
            "-",
            F.col(key_col).cast("string"),
            F.sum(new_session).over(w_run).cast("string"),
        ),
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: one hash aggregation (all algebraic, map-side
    combined): event count, duration in whole seconds, total value."""
    sec = F.unix_timestamp(ts_col)
    return sessions.groupBy("session_id").agg(
        F.first(key_col).alias(key_col),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(sec) - F.min(sec)).alias("duration_sec"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_sec: int = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, <step>_sec..., steps_completed): ordered funnel analysis —
    for each user, the earliest strictly-increasing completion times of
    ``steps``, all within ``window_sec`` of the FIRST step (the classic
    product-analytics funnel: window anchored at entry, strict ordering
    between steps).

    Per step k: one filter + one hash aggregation keyed by user (min over
    candidates later than step k-1 and inside the entry window) + one
    user-keyed join — len(steps) node-keyed shuffles total, no windows,
    no per-user sorting. A user appears iff they completed step 1;
    uncompleted later steps are NULL and never un-NULL downstream (each
    step's candidates gate on the previous step's time).

    Timestamps compare as floor-epoch seconds via unix_timestamp (the
    events-family convention: parquet naive ts reads as a UTC instant
    here, and gaps/windows are shift-immune).
    """
    sec = F.unix_timestamp(F.col(ts_col))
    ev = events.select(
        F.col(key_col).alias("user_id"), sec.alias("sec"), F.col(type_col).alias("t")
    )
    first = steps[0]
    cur = (
        ev.filter(F.col("t") == first)
        .groupBy("user_id")
        .agg(F.min("sec").alias(f"{first}_sec"))
    )
    prev_col = f"{first}_sec"
    for step in steps[1:]:
        cand = ev.filter(F.col("t") == step).select(
            "user_id", F.col("sec").alias("_cand")
        )
        ok = F.when(
            (F.col("_cand") > F.col(prev_col))
            & (F.col("_cand") <= F.col(f"{first}_sec") + F.lit(window_sec)),
            F.col("_cand"),
        )
        keep = [c for c in cur.columns]
        cur = (
            cur.join(cand, "user_id", "left")
            .groupBy(*keep)
            .agg(F.min(ok).alias(f"{step}_sec"))
        )
        prev_col = f"{step}_sec"
    done = sum(
        (F.col(f"{s}_sec").isNotNull()).cast("long") for s in steps
    )
    return cur.select(*cur.columns, done.alias("steps_completed"))


def retention_cohorts(
    events: DataFrame,
    anchor_type: str = "signup",
    bucket_sec: int = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): retention-cohort matrix — users
    are cohorted by the week of their first ``anchor_type`` event; each
    later activity (any type, at or after the anchor) lands in the
    relative week bucket ``(sec - anchor_sec) // bucket_sec``; the cell
    counts distinct active users.

    Relative (anchor-aligned) buckets, not calendar weeks, so a user who
    signs up Sunday night is not half-retained by an artifact of the
    week boundary. Two user-keyed hash aggregations + one user-keyed
    join + one (cohort, offset)-keyed count-distinct. All integer
    arithmetic (floor-epoch seconds, floor division).
    """
    sec = F.unix_timestamp(F.col(ts_col))
    ev = events.select(
        F.col(key_col).alias("user_id"), sec.alias("sec"), F.col(type_col).alias("t")
    )
    anchors = (
        ev.filter(F.col("t") == anchor_type)
        .groupBy("user_id")
        .agg(F.min("sec").alias("anchor_sec"))
    )
    b = F.lit(bucket_sec)
    return (
        ev.join(anchors, "user_id")
        .filter(F.col("sec") >= F.col("anchor_sec"))
        .select(
            F.floor(F.col("anchor_sec") / b).cast("long").alias("cohort_week"),
            F.floor((F.col("sec") - F.col("anchor_sec")) / b)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(src_event, dst_event, n_transitions, prob_ppm): first-order Markov
    transition mining over per-user event sequences — the clickstream
    bigram model behind next-page prediction and anomalous-flow detection.

    Per user, events order by (ts, tiebreak) and each consecutive pair
    contributes one (src, dst) transition; row probability is the
    source-conditional share frozen to exact ppm integers
    ((n * 1e6) DIV total) so the output is hash-reproducible.

    Shape: ONE shuffle by user (the lead window — per-key cardinality is
    bounded by a user's own event count, the sessionize argument above),
    then a transition-matrix hash agg whose key space is |event types|²
    (tiny), with the per-source total attached by a broadcastable join.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("src_event"),
            F.lead(type_col).over(w).alias("dst_event"),
        )
        .filter(F.col("dst_event").isNotNull())
    )
    counts = pairs.groupBy("src_event", "dst_event").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("src_event").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return (
        counts.join(F.broadcast(totals), "src_event")
        .select(
            "src_event",
            "dst_event",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.expr("(n_transitions * 1000000) DIV _tot").alias("prob_ppm"),
        )
    )


def session_paths(
    events: DataFrame,
    path_len: int = 3,
    top_n: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(e1, e2, e3, n_paths, rank): the corpus's most frequent in-session
    event trigrams — the path-analysis complement to markov_transitions
    (first-order bigrams can't see "view -> click -> purchase" vs
    "view -> click -> error"; order-3 patterns can).

    Sessions come from :func:`sessionize` (30-min gap), so a user's
    overnight break doesn't fabricate a path. Shape: ONE shuffle by user
    (sessionize's window and the two lead() windows share the same
    partitioning, so Spark plans them in the same sort), a trigram hash
    agg (key space |event types|^3, tiny), and a TakeOrderedAndProject
    top_n with the rank attached over the bounded result. Ties break
    (count desc, e1/e2/e3 asc).
    """
    assert path_len == 3, "oracle parity is pinned at trigrams"
    sess = sessionize(
        events, key_col=user_col, ts_col=ts_col, order_col=tiebreak_col
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(
        ts_col, tiebreak_col
    )
    tri = (
        sess.select(
            F.col(type_col).alias("e1"),
            F.lead(type_col, 1).over(w).alias("e2"),
            F.lead(type_col, 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), F.asc("e1"), F.asc("e2"), F.asc("e3")
        )
        .limit(top_n)
    )
    rw = Window.orderBy(F.desc("n_paths"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
    return tri.withColumn("rank", F.row_number().over(rw).cast("long"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    window_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """(key, left_id, right_id, gap_sec): interval/range join — every
    (left, right) pair with the same key and ``0 <= t_right - t_left <=
    window_sec`` (e.g. every purchase within an hour AFTER each click).
    The brief names range joins, with as-of joins, as the custom
    operators Spark lacks as primitives; the naive formulation is a
    theta join (cartesian per key) that Spark executes as
    BroadcastNestedLoopJoin — quadratic per key and a non-starter at
    scale.

    Bucket trick instead: both sides bucket by floor(epoch/W); a
    qualifying right row can only live in the left row's bucket or the
    next one, so the LEFT side explodes into those two (key, bucket)
    slots, equi-joins right on (key, bucket) — a plain shuffled hash
    join — and the exact [0, W] predicate filters the survivors.
    Cost: 2x left replication + candidates bounded by per-(key, 2W)
    density, linear for real event streams. Timestamps compare in
    floor-epoch seconds (the events-family convention: parquet naive ts
    reads as UTC instants here; gaps are shift-immune).
    """
    lsec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    l0 = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_id).alias("left_id"),
        lsec.alias("_lt"),
    ).select(
        "_k", "left_id", "_lt",
        F.explode(
            F.array(
                F.expr(f"_lt DIV {window_sec}"),
                F.expr(f"_lt DIV {window_sec} + 1"),
            )
        ).alias("_b"),
    )
    r0 = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_id).alias("right_id"),
        lsec.alias("_rt"),
    ).withColumn("_b", F.expr(f"_rt DIV {window_sec}"))
    return (
        l0.join(r0, ["_k", "_b"])
        .filter(
            (F.col("_rt") >= F.col("_lt"))
            & (F.col("_rt") - F.col("_lt") <= window_sec)
        )
        .select(
            F.col("_k").alias(key_col),
            "left_id",
            "right_id",
            (F.col("_rt") - F.col("_lt")).cast("long").alias("gap_sec"),
        )
        # no distinct needed: a right row owns exactly ONE bucket, so each
        # (left, right) pair can match at most one of the left's two slots
    )


def ab_lift(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort, n_users, n_converted, conv_ppm): deterministic A/B cohort
    conversion readout — users hash into A or B (portable md5, so the
    assignment replays on every rerun and every late-arriving event),
    a user converts if they emitted at least one ``convert_type`` event,
    and the per-cohort rate is frozen to ppm ints. The experiment-
    analysis primitive on the events table (the statistical test layer
    sits downstream; this is the exact-count input it needs).

    Shape: one distinct per (user, converted-or-not) — a user-keyed agg
    with map-side combine — then a 2-row cohort agg.
    """
    per_user = (
        events.select(
            F.col(user_col).alias("u"),
            (F.col(type_col) == convert_type).cast("int").alias("cv"),
        )
        .groupBy("u")
        .agg(F.max("cv").alias("converted"))
    )
    cohort = F.when(
        F.conv(F.substring(F.md5(F.col("u").cast("string")), 1, 12), 16, 10)
        .cast("long") % 2 == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    return (
        per_user.select(cohort.alias("cohort"), "converted")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "cohort", "n_users", "n_converted",
            F.expr("(n_converted * 1000000) DIV n_users").alias("conv_ppm"),
        )
    )


def rolling_counts(
    events: DataFrame,
    window_days: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, day, n, rolling_n): daily event counts plus the
    trailing ``window_days``-day rolling sum per type — the time-series
    smoothing every ops dashboard draws, as a RANGE window over epoch
    days (value-based frame, so missing days genuinely fall out of the
    window rather than sliding row-wise past them).

    Days are exact ints (epoch DIV 86400); the rolling frame runs per
    type over the DAILY rollup (bounded rows: types x days), never over
    raw events.
    """
    day = F.expr(f"CAST(floor(unix_timestamp({ts_col})) DIV 86400 AS BIGINT)")
    daily = (
        events.select(F.col(type_col).alias("event_type"), day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "event_type", "day", "n",
        F.sum("n").over(w).cast("long").alias("rolling_n"),
    )


# Pearson r's one float step, shared verbatim with the oracle; the five
# moments are exact int64 over daily counts.
_PEARSON_SQL = (
    "CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
    "    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000.0) AS BIGINT)"
)


def event_correlation(
    events: DataFrame,
    type_x: str,
    type_y: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(n_days, corr_micro): Pearson correlation between two event types'
    daily counts — the do-clicks-drive-purchases readout. Days carrying
    neither type drop (no row to join); days with one side count the
    other as 0 via the outer join + coalesce.

    Integer moments (n, Sx, Sy, Sxy, Sxx, Syy are int64 over daily
    counts), one shared-expression float step frozen to micro; NULL when
    either variance is zero.
    """
    day = F.expr(f"CAST(floor(unix_timestamp({ts_col})) DIV 86400 AS BIGINT)")
    base = events.select(F.col(type_col).alias("t"), day.alias("day"))

    def daily(t):
        return (
            base.filter(F.col("t") == t)
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    xy = (
        daily(type_x).withColumnRenamed("c", "x")
        .join(daily(type_y).withColumnRenamed("c", "y"), "day", "full_outer")
        .select(
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    return (
        xy.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        .select(
            F.col("n").alias("n_days"),
            F.expr(
                "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 "
                f"THEN {_PEARSON_SQL} END"
            ).alias("corr_micro"),
        )
    )


def session_incidents(
    events: DataFrame,
    incident_type: str = "error",
    bucket_sec: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(session_id, user_id, hour_sec, n_incidents): interval-overlap
    join — which user sessions overlap corpus-wide incident hours (hours
    containing at least one ``incident_type`` event). The "was this
    session exposed to the outage" attribution query; together with
    asof_join and range_join it completes the temporal-join family the
    brief names.

    Cover-bucket plan, no theta join: each session interval [start, end]
    explodes into the hour buckets it covers (bounded: the 30-min
    sessionize gap caps a session's span at ~events-per-session hours),
    incident hours reduce to one row each, and the overlap is a plain
    equi-join on the hour. Epoch arithmetic is integer end to end.
    """
    sec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    sess = (
        sessionize(events, key_col=user_col, ts_col=ts_col)
        .select("session_id", F.col(user_col).alias("user_id"), sec.alias("s"))
        .groupBy("session_id", "user_id")
        .agg(F.min("s").alias("_lo"), F.max("s").alias("_hi"))
    )
    covered = sess.select(
        "session_id",
        "user_id",
        F.explode(
            F.sequence(
                F.expr(f"_lo DIV {bucket_sec}"), F.expr(f"_hi DIV {bucket_sec}")
            )
        ).alias("_b"),
    )
    incidents = (
        events.filter(F.col(type_col) == incident_type)
        .select(sec.alias("s"))
        .select(F.expr(f"s DIV {bucket_sec}").alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_incidents"))
    )
    return covered.join(incidents, "_b").select(
        "session_id",
        "user_id",
        (F.col("_b") * bucket_sec).cast("long").alias("hour_sec"),
        "n_incidents",
    )


def convert_latency(
    events: DataFrame,
    from_type: str = "click",
    to_type: str = "purchase",
    window_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(bucket, lo_sec, n): log2-bucketed distribution of the FIRST
    conversion latency — per user, the gap from their first ``from_type``
    to the first ``to_type`` at-or-after it (within ``window_sec``),
    histogrammed into power-of-two second bands. The how-long-does-
    conversion-take readout, mergeable across shards like
    quantile_sketch (same log2-counter monoid).

    One user-keyed min-agg per side + one join + the bucket agg; gap 0
    (same-second) lands in bucket 0 with every sub-2s gap.
    """
    sec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    base = events.select(
        F.col(user_col).alias("u"), sec.alias("s"), F.col(type_col).alias("t")
    )
    first_from = (
        base.filter(F.col("t") == from_type)
        .groupBy("u")
        .agg(F.min("s").alias("s0"))
    )
    tos = base.filter(F.col("t") == to_type).select("u", F.col("s").alias("s1"))
    gap = (
        first_from.join(tos, "u")
        .filter(
            (F.col("s1") >= F.col("s0"))
            & (F.col("s1") - F.col("s0") <= window_sec)
        )
        .groupBy("u")
        .agg(F.min(F.col("s1") - F.col("s0")).alias("gap"))
    )
    bucket = (
        F.length(F.conv((F.col("gap") + 1).cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        gap.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bucket",
            F.expr("CAST(pow(2, bucket) AS BIGINT) - 1").alias("lo_sec"),
            "n",
        )
    )


def distinct_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, n_new_users, cum_users): the cumulative-distinct growth
    curve — per day, how many users appear for the FIRST time, and the
    running total of users ever seen. The audience-growth readout whose
    naive form (count distinct per expanding prefix) is quadratic; the
    first-seen-day formulation is two hash aggs plus a cumulative window
    over the day axis (bounded: one row per day).
    """
    day = F.expr(f"CAST(floor(unix_timestamp({ts_col})) AS BIGINT) DIV 86400")
    first = (
        events.select(F.col(user_col).alias("u"), day.alias("day"))
        .groupBy("u")
        .agg(F.min("day").alias("fd"))
    )
    daily = first.groupBy(F.col("fd").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day", "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
    )


def session_itemsets(
    events: DataFrame,
    min_support: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(item_a, item_b, n_sessions, support_ppm): frequent event-type
    PAIRS per session (the market-basket level-2 itemsets of A-priori,
    Agrawal & Srikant 1994) — which behaviors co-occur within one visit,
    support measured against the total session count.

    Row-group local after sessionization: the distinct type set per
    session is tiny (bounded by |event types|), pairs explode from the
    sorted set array (combinations, not a self-join), then one hash agg
    + the scalar session total. min_support prunes before the ppm math.
    """
    sess = sessionize(events, key_col=user_col, ts_col=ts_col)
    per = (
        sess.groupBy("session_id")
        .agg(F.array_sort(F.collect_set(type_col)).alias("items"))
        .localCheckpoint(eager=True)
    )
    n_sessions = max(per.count(), 1)
    # guard BEFORE building combinations: sequence(1, 0) descends for
    # single-item sessions and element_at(_, 0) throws under ANSI
    pairs = per.filter(F.size("items") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("items") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size("items")),
                        lambda j: F.struct(
                            F.element_at("items", i).alias("a"),
                            F.element_at("items", j).alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).filter(F.col("p").isNotNull())
    return (
        pairs.select("p.a", "p.b")
        .groupBy(F.col("a").alias("item_a"), F.col("b").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_support)
        .select(
            "item_a", "item_b", "n_sessions",
            F.expr(f"(n_sessions * 1000000) DIV {n_sessions}").alias(
                "support_ppm"
            ),
        )
    )
