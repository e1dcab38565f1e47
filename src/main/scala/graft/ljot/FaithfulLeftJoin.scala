package graft.ljot

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input record, side-tagged. `left = true` → lhs arm (the reference's
 * `ScheduleProcessor` input, `ScheduleProcessor.java:23-25`); `left = false`
 * → rhs arm feeding the windowed join. */
private[ljot] case class TaggedRec(key: Long, value: String, ts: Timestamp, left: Boolean)

/** Un-joined output row; the user joiner is applied afterwards as a Column
 * over (lvalue, rvalue) so batch/streaming/faithful share one joiner type. */
private[ljot] case class PairOut(key: Long, lvalue: String, rvalue: Option[String], ts: Timestamp)

/** Mirror of the reference state row `Scheduled<K,V>{key,value,timestamp}`
 * (`Scheduled.java:9-24`) plus the wall-clock deadline that replaces the
 * transient `ScheduledFuture`. */
private[ljot] case class Pending(value: String, ts: Long, deadlineMs: Long)

/** Per-key join state: both sides' in-retention records (the window-store
 * role Kafka Streams' join plays internally) + the pending-timeout multimap
 * (`ScheduledStateStore.java:29`). `lastActiveMs` (processing time of the
 * last arrival) bounds idle-state lifetime: a key that stops receiving
 * records is dropped wholesale after the retention period, the same net
 * effect as the reference's window-store retention reaper — without it the
 * state (and its re-armed timers) would live forever. */
private[ljot] case class KeyState(
    lefts: List[(String, Long)],
    rights: List[(String, Long)],
    pending: List[Pending],
    maxEventTs: Long,
    lastActiveMs: Long)

/**
 * Faithful re-implementation of the reference semantics that the idiomatic
 * left-outer join deliberately cleans up (SURVEY.md §2.3):
 *
 *  - **key-level cancellation** (§2.3-3): any join output for key k cancels
 *    ALL pending timeout emissions for k (`ScheduledStateStore.java:87-115`
 *    iterates the whole multimap entry), even for a left whose own window
 *    does not contain the joining right;
 *  - **processing-time timeout, event-time band** (§2.3-4): the timer is
 *    wall-clock from left arrival (`ScheduledStateStore.java:69-82`) while
 *    the band is event-time;
 *  - **restore re-arms timers with the full delay** (§2.3-7): Spark's
 *    processing-time timeouts are re-evaluated per trigger after a
 *    checkpoint restart — the same behavior the reference gets from
 *    replaying the changelog (`ScheduledStateStore.java:123-137`).
 *
 * Single stateful operator: tagged union of both sides → `groupByKey(key)`
 * → `flatMapGroupsWithState(Append, ProcessingTimeTimeout)`. Each group is
 * processed single-threaded, so the reference's concurrency machinery
 * (`MultiMapUtils.java:15-35`, `BlockingScheduledExecutor.java:6-129`)
 * reduces to plain List updates — the shuffle partitioning by key is the
 * scale mechanism, identical in role to the reference's per-partition state
 * (`StateStoreLogger.java:22-23`).
 */
object FaithfulLeftJoin {

  def apply(lhs: DataFrame, rhs: DataFrame, joiner: LeftJoinOnTimeout.Joiner,
            cfg: LeftJoinOnTimeoutConfig): DataFrame = {
    val spark = lhs.sparkSession
    import spark.implicits._

    val tag = (df: DataFrame, isLeft: Boolean) =>
      df.select(col("key").cast("long").as("key"),
                col("value").cast("string").as("value"),
                col("ts").cast("timestamp").as("ts"),
                lit(isLeft).as("left")).as[TaggedRec]

    val union = tag(lhs, true).unionByName(tag(rhs, false))

    val d = cfg.joinWindow.toMillis
    val r = cfg.retention.toMillis
    val timeoutMs = cfg.effectiveTimeout.toMillis

    val maxScheduled = cfg.maxScheduled
    val out: Dataset[PairOut] = union
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, PairOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key, records, state) =>
          processKey(key, records, state, d, r, timeoutMs, maxScheduled)
      }

    out.toDF()
      .select(col("key"),
              joiner(col("lvalue"), col("rvalue")).as("joined"),
              col("ts"))
  }

  /** Core per-key transition. Pulled out for direct unit testing.
   *
   * `maxScheduled` caps the per-key pending-timeout list — the reference's
   * backpressure bound (`BlockingScheduledExecutor.java:19-31` blocks the
   * stream thread at capacity until a timer fires and frees a slot). A
   * micro-batch cannot block mid-trigger, so the closest analog with the
   * same invariants is applied: when a schedule would exceed capacity, the
   * OLDEST pending emission fires immediately (early). Every unmatched left
   * still emits exactly once and per-key state stays bounded at
   * `maxScheduled` entries; the divergence (early emission instead of
   * delayed ingestion) is the documented block→fire mapping. */
  private[ljot] def processKey(
      key: Long,
      records: Iterator[TaggedRec],
      state: GroupState[KeyState],
      bandMs: Long,
      retentionMs: Long,
      timeoutMs: Long,
      maxScheduled: Int = Int.MaxValue): Iterator[PairOut] = {

    val now = state.getCurrentProcessingTimeMs()
    val s0 = state.getOption.getOrElse(KeyState(Nil, Nil, Nil, Long.MinValue, now))
    val out = List.newBuilder[PairOut]
    var maxEventTs = s0.maxEventTs
    var lastActiveMs = s0.lastActiveMs

    // Hot-key safe accumulation: O(1) append/removeHead buffers, converted
    // from/to the encoded List state exactly once per trigger (a `:+` on
    // List is an O(n) copy — quadratic over a hot key's micro-batch).
    val pending = scala.collection.mutable.ArrayDeque.empty[Pending]
    val lefts = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val rights = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    lefts ++= s0.lefts
    rights ++= s0.rights

    // 1. Fire overdue timers (the `ScheduledThreadPoolExecutor` role,
    //    `ScheduledStateStore.java:69-82`): emit joiner(l, null) with the
    //    LEFT's original event ts (`LeftJoinOnTimeoutBuilder.java:165-168`).
    s0.pending.foreach { p =>
      if (p.deadlineMs <= now) out += PairOut(key, p.value, None, new Timestamp(p.ts))
      else pending.append(p)
    }

    // 2. Process arrivals in order (single stream thread per key, like the
    //    reference's per-task processing).
    records.foreach { rec =>
      val ts = rec.ts.getTime
      maxEventTs = math.max(maxEventTs, ts)
      lastActiveMs = now
      if (rec.left) {
        // windowed join probe: left vs retained rights (O4)
        var matched = false
        rights.foreach { case (rv, rts) =>
          if (math.abs(rts - ts) <= bandMs) {
            matched = true
            out += PairOut(key, rec.value, Some(rv), rec.ts)
          }
        }
        if (matched) {
          // join output → CancelProcessor cancels ALL pending for the key
          // (`ScheduledStateStore.java:87-115`) — including this left.
          pending.clear()
        } else {
          // ScheduleProcessor: register the deferred joiner(l, null);
          // at capacity the oldest fires early (see scaladoc).
          pending.append(Pending(rec.value, ts, now + timeoutMs))
          if (pending.size > maxScheduled) {
            val oldest = pending.removeHead()
            out += PairOut(key, oldest.value, None, new Timestamp(oldest.ts))
          }
        }
        lefts += ((rec.value, ts))
      } else {
        // right arrival probes retained lefts — every in-window pair emits
        // (per-pair semantics, `LeftJoinOnTimeoutTest.java:89-91`)
        var matched = false
        lefts.foreach { case (lv, lts) =>
          if (math.abs(lts - ts) <= bandMs) {
            matched = true
            out += PairOut(key, lv, Some(rec.value), new Timestamp(lts))
          }
        }
        if (matched) pending.clear() // key-level cancel
        rights += ((rec.value, ts))
      }
    }

    // 3. Evict join state past retention R (`JoinWindows.until(R)`,
    //    `LeftJoinOnTimeoutBuilder.java:114`) by stream time.
    val horizon = maxEventTs - retentionMs
    val s = KeyState(
      lefts.filter(_._2 >= horizon).toList,
      rights.filter(_._2 >= horizon).toList,
      pending.toList,
      maxEventTs,
      lastActiveMs)

    // 4. Persist + re-arm the group timer for the earliest pending deadline
    //    (restore after checkpoint re-evaluates this per trigger —
    //    reference restore parity, §2.3-7). A key that has been idle for a
    //    full retention period with nothing pending is dropped entirely —
    //    bounded state, and the engine reaches quiescence (no perpetual
    //    no-data micro-batches from eternally re-armed timers).
    val idle = now - s.lastActiveMs >= retentionMs
    if (s.pending.isEmpty && (idle || (s.lefts.isEmpty && s.rights.isEmpty))) {
      state.remove()
    } else {
      state.update(s)
      if (s.pending.nonEmpty) {
        val earliest = s.pending.map(_.deadlineMs).min
        state.setTimeoutDuration(math.max(1L, earliest - now))
      } else {
        // wake once more when the idle-retention horizon passes
        state.setTimeoutDuration(math.max(1L, s.lastActiveMs + retentionMs - now))
      }
    }
    out.result().iterator
  }
}
