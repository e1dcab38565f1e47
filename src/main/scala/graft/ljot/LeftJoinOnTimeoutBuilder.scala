package graft.ljot

import java.time.Duration

import org.apache.spark.sql.DataFrame

/**
 * Fluent builder mirroring the reference's public API surface
 * (`LeftJoinOnTimeoutBuilder.java:19-122`): ctor takes the two streams, the
 * joiner and the window/retention; `timeout`, `scheduledCapacity`,
 * `enableStateLog`, `sinkTo` configure; `buildTopology()` validates and
 * wires.
 *
 * Spark differences, kept deliberately:
 *  - serdes are unnecessary (`serdes(...)` in the reference,
 *    `LeftJoinOnTimeoutBuilder.java:70-77`) — DataFrames carry schemas;
 *  - `enableStateLog` maps to a checkpoint location (Structured Streaming's
 *    WAL + state snapshots replace the changelog topic,
 *    `StateStoreLogger.java:22-31`);
 *  - `build()` returns the joined DataFrame (lazy plan = the topology);
 *    callers attach their own sink, or use `sinkTo` for parquet output.
 *
 * Validation parity with `validateArguments()`
 * (`LeftJoinOnTimeoutBuilder.java:124-143`): non-null inputs, D > 0,
 * timeout > D, capacity > 0 — enforced by `LeftJoinOnTimeoutConfig`.
 */
final class LeftJoinOnTimeoutBuilder private (
    lhs: DataFrame,
    rhs: DataFrame,
    joiner: LeftJoinOnTimeout.Joiner,
    joinWindow: Duration,
    retention: Duration,
    timeoutOpt: Option[Duration],
    capacity: Int,
    checkpoint: Option[String],
    faithfulMode: Boolean) {

  /** `timeout(ms)` — override the default `D + 100 ms` (`:55-60`). */
  def timeout(t: Duration): LeftJoinOnTimeoutBuilder = copy(timeoutOpt = Some(t))

  /** `scheduledCapacity(n)` (`:84-87`) — maps to source rate limiting. */
  def scheduledCapacity(n: Int): LeftJoinOnTimeoutBuilder = copy(capacity = n)

  /** `enableStateLog(...)` (`:62-68`) — fault tolerance; in Spark this is a
   * checkpoint location used by the streaming variant. */
  def enableStateLog(checkpointLocation: String): LeftJoinOnTimeoutBuilder =
    copy(checkpoint = Some(checkpointLocation))

  /** Select the faithful `flatMapGroupsWithState` variant: key-level cancel
   * + processing-time timers (SURVEY.md §2.3-3/-4). */
  def faithful(enabled: Boolean = true): LeftJoinOnTimeoutBuilder =
    copy(faithfulMode = enabled)

  def config: LeftJoinOnTimeoutConfig =
    LeftJoinOnTimeoutConfig(joinWindow, retention, timeoutOpt, capacity)

  def checkpointLocation: Option[String] = checkpoint

  /** `buildTopology()` (`:95-122`): validate and produce the joined plan.
   * Nothing executes until an action / `writeStream.start()` — same
   * laziness as the reference (execution starts at `KafkaStreams.start()`,
   * SURVEY.md §3.1). */
  def build(): DataFrame = {
    val cfg = config // constructor runs the validations
    if (faithfulMode) FaithfulLeftJoin(lhs, rhs, joiner, cfg)
    else LeftJoinOnTimeout(lhs, rhs, joiner, cfg)
  }

  /** `sinkTo(topic, producer)` (`:44-53`) analog: build and write to a
   * parquet path (batch) — one sink for both branches, because the outer
   * join already unions them (SURVEY.md §2.1-O3). */
  def sinkTo(path: String): Unit =
    build().write.mode("overwrite").parquet(path)

  private def copy(
      timeoutOpt: Option[Duration] = timeoutOpt,
      capacity: Int = capacity,
      checkpoint: Option[String] = checkpoint,
      faithfulMode: Boolean = faithfulMode): LeftJoinOnTimeoutBuilder =
    new LeftJoinOnTimeoutBuilder(lhs, rhs, joiner, joinWindow, retention,
      timeoutOpt, capacity, checkpoint, faithfulMode)
}

object LeftJoinOnTimeoutBuilder {
  /** Mirrors the reference ctor `(builder, lhs, rhs, joiner, D, R)`
   * (`LeftJoinOnTimeoutBuilder.java:45-53`); the topology builder arg
   * disappears — the DataFrame lineage is the topology. */
  def apply(lhs: DataFrame, rhs: DataFrame, joiner: LeftJoinOnTimeout.Joiner,
            joinWindow: Duration, retention: Duration): LeftJoinOnTimeoutBuilder = {
    require(lhs != null && rhs != null && joiner != null,
      "lhs, rhs and joiner must be non-null (ref :133-136)")
    new LeftJoinOnTimeoutBuilder(lhs, rhs, joiner, joinWindow, retention,
      None, LeftJoinOnTimeoutConfig.DefaultScheduledCapacity, None, false)
  }
}
