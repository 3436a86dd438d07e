"""Event-stream batch operators (SURVEY.md §2-F extensions, round 5):
point-in-time (as-of) join and inactivity-gap sessionization.

Both are operators Spark's DataFrame API lacks as primitives but a
transcript/event pipeline needs constantly (join each turn to the
most recent config snapshot; split a user's event stream on
inactivity). Both are built here as ONE-shuffle compositions of
window functions — the 100 TB shape — instead of the naive range
join, which Catalyst can only execute as a broadcast-nested-loop or
an exploding theta join when the time predicate is an inequality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

#: tag values — right rows must sort BEFORE left rows at an equal
#: timestamp so an exactly-simultaneous right row is visible to the
#: left row (ASOF's ``left.ts >= right.ts`` contract)
_RIGHT, _LEFT = 0, 1


def micros(col) -> F.Column:
    """Exact integer microseconds since epoch. Parquet timestamps
    read as TIMESTAMP_NTZ, which unix_micros rejects; the cast
    interprets them in the session timezone — kg.session pins UTC,
    so the instant is preserved (and in any timezone, DIFFERENCES of
    two casts cancel the offset outside DST transitions)."""
    return F.unix_micros(F.col(col).cast("timestamp")
                         if isinstance(col, str) else
                         col.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts: str, payload: list[str]) -> DataFrame:
    """Point-in-time join: for every ``left`` row, attach ``payload``
    columns from the LAST ``right`` row with the same ``keys`` and
    ``right.ts <= left.ts`` (a left outer as-of join — unmatched left
    rows keep nulls). Matches DuckDB's ``ASOF LEFT JOIN`` semantics,
    which the contract oracle uses as the independent replay.

    Shape: union the tagged sides, then one window
    ``last(payload, ignorenulls) over (partition by keys order by
    (ts, tag) rows unbounded preceding..current)`` and keep the left
    rows. ONE exchange on ``keys`` total — no inequality join, so no
    BroadcastNestedLoop and no per-key quadratic pair fan-out; a
    billion-row right side costs the same shuffle it would cost to
    sort it. Hot keys skew exactly like any window over the same key
    (salt upstream via kg.stages.skew if a single key dominates).

    ``left`` must not already contain the payload columns. Ties
    inside ``right`` on (keys, ts) are resolved by whichever sorts
    last only if the caller makes them unique — dedupe the right side
    first when (keys, ts) is not a key, or engines may disagree."""
    lt = left.withColumn("_tag", F.lit(_LEFT))
    for c in payload:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(*keys, ts, *payload,
                      F.lit(_RIGHT).alias("_tag"))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.unionByName(rt)
    w = (W.partitionBy(*keys).orderBy(ts, "_tag")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("_tag") == _LEFT).drop("_tag")


def sessionize_by_gap(events: DataFrame, keys: list[str], ts: str,
                      gap_s: int = 1800) -> DataFrame:
    """Inactivity-gap sessionization: within each ``keys`` group
    ordered by ``ts``, a new session starts when the gap to the
    previous event EXCEEDS ``gap_s`` seconds (a gap of exactly
    ``gap_s`` stays in-session). Adds ``session_idx`` (0-based per
    group, dense) to every event row.

    The standard lag → boundary flag → running-sum composition; both
    windows share one partitioning on ``keys``, so the whole operator
    is a single exchange + one in-partition sort — same cost class as
    ranking the events, independent of session count. The caller
    aggregates per (keys, session_idx) afterwards; that groupBy
    reuses the same hash partitioning when AQE leaves it co-located.

    Deterministic only when (keys, ts) is unique (true for the events
    table; enforce upstream otherwise) — equal timestamps would make
    lag order engine-dependent. Gap arithmetic is exact integer
    MICROSECONDS (unix_micros ↔ DuckDB epoch_us): unix_timestamp
    would truncate sub-second components and disagree with an engine
    computing fractional seconds."""
    w = W.partitionBy(*keys).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    new_sess = (prev.isNull() |
                (micros(ts) - micros(prev)
                 > gap_s * 1_000_000)).cast("long")
    return (events.withColumn("_new", new_sess)
            .withColumn("session_idx",
                        (F.sum("_new").over(
                            w.rowsBetween(W.unboundedPreceding,
                                          W.currentRow)) - 1)
                        .cast("int"))
            .drop("_new"))
