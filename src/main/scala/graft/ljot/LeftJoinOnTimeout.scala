package graft.ljot

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Configuration for the left-join-on-timeout operator.
 *
 * Mirrors the reference builder's knobs
 * (`LeftJoinOnTimeoutBuilder.java:24-25,50-59,84-87`):
 *
 * @param joinWindow   D — symmetric join band: a right matches a left when
 *                     `r.ts ∈ [l.ts − D, l.ts + D]` (Kafka 0.11
 *                     `JoinWindows.of(D)` semantics,
 *                     `LeftJoinOnTimeoutBuilder.java:114`).
 * @param retention    R — how long join state is retained
 *                     (`JoinWindows.until(R)`); maps to the watermark delay
 *                     in the streaming variant.
 * @param timeout      wall-clock delay before a left with no match emits
 *                     `joiner(l, null)`; defaults to `D + 100 ms`
 *                     (`LeftJoinOnTimeoutBuilder.java:24,59`), must be > D
 *                     (`:130`). Only observable in the faithful streaming
 *                     variant — the idiomatic variant expires on event time.
 * @param maxScheduled backpressure bound on pending timeouts
 *                     (`LeftJoinOnTimeoutBuilder.java:25`); maps to
 *                     `maxOffsetsPerTrigger`-style source rate limiting in
 *                     Spark (state is disk-backed, not heap-capped), and is
 *                     ENFORCED in the faithful variant as a per-key cap on
 *                     the pending list — at capacity the oldest pending
 *                     emission fires early instead of blocking ingestion
 *                     (`FaithfulLeftJoin.processKey` scaladoc).
 */
final case class LeftJoinOnTimeoutConfig(
    joinWindow: Duration,
    retention: Duration,
    timeout: Option[Duration] = None,
    maxScheduled: Int = LeftJoinOnTimeoutConfig.DefaultScheduledCapacity) {

  require(!joinWindow.isNegative && !joinWindow.isZero, "joinWindow must be > 0")
  require(retention.compareTo(joinWindow) >= 0, "retention must be >= joinWindow")
  require(maxScheduled > 0, "maxScheduled must be > 0")

  /** Effective timeout: `D + 100 ms` unless overridden (`LeftJoinOnTimeoutBuilder.java:59`). */
  val effectiveTimeout: Duration =
    timeout.getOrElse(joinWindow.plusMillis(LeftJoinOnTimeoutConfig.DefaultTimeoutGapMs))
  require(effectiveTimeout.compareTo(joinWindow) > 0,
    "timeout must exceed the join window (ref LeftJoinOnTimeoutBuilder.java:130)")
}

object LeftJoinOnTimeoutConfig {
  /** `DEFAULT_TIMEOUT_GAP_IN_MS` (`LeftJoinOnTimeoutBuilder.java:24`). */
  val DefaultTimeoutGapMs = 100L
  /** `DEFAULT_SCHEDULED_CAPACITY` (`LeftJoinOnTimeoutBuilder.java:25`). */
  val DefaultScheduledCapacity = 1000
}

/**
 * Spark-native rebuild of the reference's composite operator: a windowed
 * interval equi-join whose left side is completed with `joiner(l, null)`
 * rows for lefts that never match (reference essence: `README.md:4-8`,
 * topology `LeftJoinOnTimeoutBuilder.java:95-122`).
 *
 * Inputs are DataFrames with columns `(key, value, ts)`. The output is
 * `(key, joined, ts)` where `ts` is always the LEFT record's event
 * timestamp — the reference stamps the left ts onto timeout records
 * (`LeftJoinOnTimeoutBuilder.java:165-168`) and Kafka Streams stamps join
 * outputs with the triggering record's ts; we normalize to the left ts for
 * determinism (documented divergence, SURVEY.md §2.3-5).
 *
 * Batch inputs plan as ONE left-outer join — Catalyst's equi-join
 * extraction keys the shuffle on `key` and applies the time band as a
 * join-level filter; the reference's schedule/cancel machinery
 * (~400 LoC of timers, semaphores and changelogs) has no batch analog to
 * preserve. Streaming inputs use the stream-stream left-outer join with
 * watermarks: Spark's symmetric-hash join state + watermark expiry IS the
 * schedule/cancel mechanism (SURVEY.md §2.1-O5).
 */
object LeftJoinOnTimeout {

  /** Column-level joiner: `(leftValue, rightValueOrNull) => joined`.
   * Mirrors `ValueJoiner<LV, RV, JV>` (`LeftJoinOnTimeoutBuilder.java:30`);
   * on the timeout path the right argument is NULL (`:164`). */
  type Joiner = (Column, Column) => Column

  /** Default joiner from the reference tests
   * (`LeftJoinOnTimeoutTest.java:205`): `l + "+" + r`, or `l + "+"` when
   * the right is absent. */
  val testJoiner: Joiner = (l, r) => concat(l, lit("+"), coalesce(r, lit("")))

  /**
   * Batch or streaming left-join-on-timeout.
   *
   * @param lhs  DataFrame with columns (key, value, ts)
   * @param rhs  DataFrame with columns (key, value, ts)
   * @param joiner combine function over (l.value, nullable r.value)
   * @return (key, joined, ts) — one row per in-window (l, r) pair, plus one
   *         `joiner(l, null)` row per left with no in-window match.
   */
  def apply(lhs: DataFrame, rhs: DataFrame, joiner: Joiner,
            cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val streaming = lhs.isStreaming || rhs.isStreaming
    if (streaming) streamingJoin(lhs, rhs, joiner, cfg)
    else batchJoin(lhs, rhs, joiner, cfg)
  }

  /** Inner windowed interval equi-join only (reference O4,
   * `LeftJoinOnTimeoutBuilder.java:112-115`): one output per in-window
   * (l, r) pair. */
  def innerJoin(lhs: DataFrame, rhs: DataFrame, joiner: Joiner,
                cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val (l, r) = tagged(lhs, rhs, cfg)
    l.join(r, bandCondition(cfg), "inner")
      .select(col("lkey").as("key"),
              joiner(col("lvalue"), col("rvalue")).as("joined"),
              col("lts").as("ts"))
  }

  /** Full-outer windowed interval equi-join — the symmetric completion
   * of the family (inner = O4, left = O5): unmatched LEFTS and unmatched
   * RIGHTS both surface. The reference cannot express this (Kafka
   * Streams' `leftJoin` timers only track the lhs,
   * `LeftJoinOnTimeoutBuilder.java:95-122`); in the events domain the
   * right-side orphans are exactly the errors no purchase explains —
   * the other half of the reconciliation audit. Output is symmetric
   * (key, lvalue, rvalue, lts, rts) rather than joiner-applied: the
   * reference `ValueJoiner` contract (`:30`) is left-biased and has no
   * null-left form to mirror. */
  def fullOuterJoin(lhs: DataFrame, rhs: DataFrame,
                    cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val (l0, r0) = tagged(lhs, rhs, cfg)
    // streaming full-outer needs both watermarks (each side's orphans
    // emit when the OTHER side's watermark clears its band) — same
    // retention→watermark mapping as the streaming left join
    val streaming = lhs.isStreaming || rhs.isStreaming
    val wm = s"${cfg.retention.toMillis} milliseconds"
    val (l, r) =
      if (streaming) (l0.withWatermark("lts", wm), r0.withWatermark("rts", wm))
      else (l0, r0)
    l.join(r, bandCondition(cfg), "full_outer")
      .select(coalesce(col("lkey"), col("rkey")).as("key"),
              col("lvalue"), col("rvalue"), col("lts"), col("rts"))
  }

  private def batchJoin(lhs: DataFrame, rhs: DataFrame, joiner: Joiner,
                        cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val (l, r) = tagged(lhs, rhs, cfg)
    l.join(r, bandCondition(cfg), "left_outer")
      .select(col("lkey").as("key"),
              joiner(col("lvalue"), col("rvalue")).as("joined"),
              col("lts").as("ts"))
  }

  /**
   * Idiomatic streaming variant: stream-stream left-outer join. The
   * watermark (delay = retention R) bounds both sides' state exactly like
   * `JoinWindows.until(R)`; null-padded rows emit once the watermark passes
   * `l.ts + D` — the event-time restatement of the reference's wall-clock
   * timer (SURVEY.md §2.3-4; deliberate, deterministic divergence).
   */
  private def streamingJoin(lhs: DataFrame, rhs: DataFrame, joiner: Joiner,
                            cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val wm = s"${cfg.retention.toMillis} milliseconds"
    val (l0, r0) = tagged(lhs, rhs, cfg)
    val l = l0.withWatermark("lts", wm)
    val r = r0.withWatermark("rts", wm)
    l.join(r, bandCondition(cfg), "left_outer")
      .select(col("lkey").as("key"),
              joiner(col("lvalue"), col("rvalue")).as("joined"),
              col("lts").as("ts"))
  }

  /** Rename to side-tagged column names so self-joins (lhs and rhs carved
   * from the same source) never hit ambiguous-attribute resolution. */
  private def tagged(lhs: DataFrame, rhs: DataFrame,
                     cfg: LeftJoinOnTimeoutConfig): (DataFrame, DataFrame) = {
    val l = lhs.select(col("key").as("lkey"), col("value").as("lvalue"),
                       col("ts").as("lts"))
    val r = rhs.select(col("key").as("rkey"), col("value").as("rvalue"),
                       col("ts").as("rts"))
    (l, r)
  }

  /** `l.key = r.key AND r.ts ∈ [l.ts − D, l.ts + D]` — the symmetric
   * Kafka-0.11 `JoinWindows.of(D)` band (SURVEY.md §2.3-1). Expressed with
   * `expr` interval arithmetic so Catalyst extracts the equi-key for the
   * shuffle and keeps the band as a range predicate. */
  private def bandCondition(cfg: LeftJoinOnTimeoutConfig): Column = {
    val d = cfg.joinWindow.toMillis
    col("lkey") === col("rkey") &&
      col("rts") >= expr(s"lts - INTERVAL $d MILLISECONDS") &&
      col("rts") <= expr(s"lts + INTERVAL $d MILLISECONDS")
  }
}
