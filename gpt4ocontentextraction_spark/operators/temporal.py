"""Temporal joins the DataFrame API lacks as primitives: AS-OF join
(most recent right row at or before each left row) and interval-overlap
range join (sessions x time windows), both expressed as compositions of
built-in operators that survive 10^12-row inputs.

AS-OF (the kdb+/Flink temporal-join shape, here as last-touch
attribution): Spark has no ASOF JOIN operator, and the naive form —
an inequality theta-join + per-left argmax — is a quadratic disaster.
The scalable composition is UNION + ORDERED CARRY: tag both streams,
sort within the join key by (ts, side), and carry the last non-null
right payload forward with last(ignorenulls) over an unbounded-
preceding row frame. One shuffle on the key, linear state, no n^2.
The DuckDB oracle uses its native ASOF LEFT JOIN — an independent
implementation, so parity checks the semantics, not the plan.

RANGE JOIN (interval overlap): sessions (gaps-and-islands, the
sessionize gate's semantics) against daily promotional windows. The
scalable shape is GRAIN BUCKETING: explode each interval to the day
grains it touches and equality-join on the grain — the standard
decomposition of an interval join into a shuffle join (each
(session, window) pair meets on exactly one grain here because windows
are within-day, so no post-join dedup). The oracle is the flat
inequality join.

Determinism: all timestamps become epoch MICROSECOND bigints
(unix_micros(cast(ts as timestamp)) under the session's UTC tz ==
DuckDB epoch_us on the same naive parquet values — probed exact);
every derived quantity (gap, overlap, day index) is integer
arithmetic. Ties: the right stream is deduped to one row per
(key, ts) keeping max event_id; at equal left/right ts the right row
sorts first (side 0 < 1), matching ASOF's ts >= semantics.

Reference analog: the reference pipeline is batch document extraction
with no event-time operators (SURVEY.md section 2.7); these extend the
engine with the temporal primitives a training-data/event pipeline
needs (attribution, exposure windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = "unix_micros(cast(ts as timestamp))"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000
SESSION_GAP_US = 10 * 60 * 1_000_000  # the sessionize gate's 10 minutes
PROMO_START_HOUR = 12
PROMO_END_HOUR = 14


def _events_us(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.expr(_US).alias("us"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "value",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
) -> DataFrame:
    """Generic AS-OF LEFT join: every left row gains the payload of the
    most recent right row with right.ts <= left.ts within the key
    (NULLs when none). `right` must already be unique per (key, ts).

    Plan: one exchange on the key + one partitioned window — the
    linear-state carry. At 10^12 rows per side, pre-bucket both inputs
    on (key) so the union sort is within co-located partitions; a hot
    key's carry is still a single ordered scan of that key's rows."""
    pstruct = F.struct(*[F.col(c) for c in payload]).alias("_p")
    ptype = (
        right.select(pstruct).schema["_p"].dataType.simpleString()
    )
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"), pstruct
    )
    l_cols = [c for c in left.columns if c not in (key, ts)]
    lt = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ptype).alias("_p"),
        *l_cols,
    )
    u = r.select(
        key, ts, "_side", "_p", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols]
    ).unionByName(lt)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_lp", F.last("_p", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        key,
        ts,
        *l_cols,
        *[F.col(f"_lp.{c}").alias(c) for c in payload],
    )
    return out


def asof_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: each 'click' event joined as-of to the
    most recent prior-or-equal 'purchase' by the same user. Output one
    row per click with the attributed purchase id/time/value (NULL when
    the user has no prior purchase) and the exact integer gap in
    microseconds."""
    ev = _events_us(events)
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "us")
        .agg(
            F.max(
                F.struct(
                    F.col("event_id").alias("purchase_id"),
                    F.col("value").alias("purchase_value"),
                )
            ).alias("m")
        )
        .select(
            "user_id",
            "us",
            F.col("m.purchase_id").alias("purchase_id"),
            F.col("us").alias("purchase_us"),
            F.col("m.purchase_value").alias("purchase_value"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "us",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    j = asof_join(
        clicks,
        purch,
        key="user_id",
        ts="us",
        payload=["purchase_id", "purchase_us", "purchase_value"],
    )
    return j.select(
        "click_id",
        "user_id",
        F.col("us").alias("click_us"),
        "click_value",
        "purchase_id",
        "purchase_us",
        (F.col("us") - F.col("purchase_us")).alias("gap_us"),
        "purchase_value",
    )


def session_promo_overlap(events: DataFrame) -> DataFrame:
    """Interval-overlap range join: 10-minute-gap user sessions (the
    sessionize gate's islands, as [start_us, end_us] intervals) against
    daily promotional windows (12:00-14:00 on every day that has
    events). Output one row per overlapping (session, promo day) with
    the exact integer overlap.

    Grain bucketing: a session explodes to the day indexes it touches
    (sessions are gap-bounded, so the per-row fanout is small and
    data-independent of corpus size); promo windows are keyed by day
    index, so the range join becomes an equality join on day_idx +
    an exact overlap filter. A midnight-spanning session meets both
    days' windows — each on its own grain, no dedup needed."""
    ev = _events_us(events).select("user_id", "us", "event_id")
    ow = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.col("us") - F.lag("us").over(ow) >= SESSION_GAP_US, 1
        )
        .when(F.lag("us").over(ow).isNull(), 1)
        .otherwise(0),
    )
    sess = (
        marked.withColumn("sid", F.sum("new_s").over(ow))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s_start"),
            F.max("us").alias("s_end"),
            F.count("*").alias("n_events"),
        )
    )
    days = sess.withColumn(
        "day_idx",
        F.explode(
            F.sequence(
                F.expr(f"s_start DIV {DAY_US}"),
                F.expr(f"s_end DIV {DAY_US}"),
            )
        ),
    )
    promos = (
        ev.select(F.expr(f"us DIV {DAY_US}").alias("day_idx"))
        .distinct()
        .select(
            "day_idx",
            (
                F.col("day_idx") * DAY_US + PROMO_START_HOUR * HOUR_US
            ).alias("p_start"),
            (F.col("day_idx") * DAY_US + PROMO_END_HOUR * HOUR_US).alias(
                "p_end"
            ),
        )
    )
    j = days.join(F.broadcast(promos), "day_idx")
    overlap = F.least("s_end", "p_end") - F.greatest("s_start", "p_start")
    return (
        j.withColumn("overlap_us", overlap)
        .where(F.col("overlap_us") > 0)
        .select(
            "user_id",
            F.col("s_start").alias("session_start_us"),
            F.col("s_end").alias("session_end_us"),
            "n_events",
            "day_idx",
            "overlap_us",
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

ASOF_ATTRIBUTION_SQL = """
WITH te AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, epoch_us(ts) AS us,
         CAST(user_id AS BIGINT) AS user_id, event_type, value
  FROM events
),
tp0 AS (
  SELECT user_id, us, MAX(event_id) AS purchase_id
  FROM te WHERE event_type = 'purchase' GROUP BY user_id, us
),
tp AS (
  SELECT p.user_id, p.us, p.purchase_id, e.value AS purchase_value
  FROM tp0 p JOIN te e ON e.event_id = p.purchase_id
),
tc AS (
  SELECT event_id AS click_id, user_id, us, value AS click_value
  FROM te WHERE event_type = 'click'
)
SELECT c.click_id, c.user_id, c.us AS click_us, c.click_value,
       p.purchase_id, p.us AS purchase_us,
       c.us - p.us AS gap_us,
       p.purchase_value
FROM tc c ASOF LEFT JOIN tp p
  ON c.user_id = p.user_id AND c.us >= p.us
"""

SESSION_PROMO_OVERLAP_SQL = f"""
WITH te AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us,
         CAST(event_id AS BIGINT) AS event_id
  FROM events
),
tmarked AS (
  SELECT user_id, us, event_id,
    CASE WHEN LAG(us) OVER w IS NULL
           OR us - LAG(us) OVER w >= {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS new_s
  FROM te
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
tsess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid,
         us
  FROM tmarked
),
tivl AS (
  SELECT user_id, MIN(us) AS s_start, MAX(us) AS s_end,
         COUNT(*) AS n_events
  FROM tsess GROUP BY user_id, sid
),
tpromo AS (
  SELECT DISTINCT us // {DAY_US} AS day_idx,
         (us // {DAY_US}) * {DAY_US} + {PROMO_START_HOUR * HOUR_US} AS p_start,
         (us // {DAY_US}) * {DAY_US} + {PROMO_END_HOUR * HOUR_US} AS p_end
  FROM te
)
SELECT s.user_id, s.s_start AS session_start_us, s.s_end AS session_end_us,
       s.n_events, p.day_idx,
       least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start) AS overlap_us
FROM tivl s JOIN tpromo p
  ON s.s_start < p.p_end AND p.p_start < s.s_end
WHERE least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start) > 0
"""
