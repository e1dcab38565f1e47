package graft.ljot

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Unit tests for the faithful variant's per-key transition function,
 * covering the reference quirks the idiomatic join cleans up
 * (SURVEY.md §2.3), plus one wall-clock end-to-end run. */
class FaithfulLeftJoinSpec extends AnyFunSuite with SparkTestHarness {

  private val bandMs = 100L
  private val retentionMs = 300L
  private val timeoutMs = 200L

  private def state(s: Option[KeyState], nowMs: Long,
                    timedOut: Boolean = false): TestGroupState[KeyState] =
    TestGroupState.create[KeyState](
      org.apache.spark.api.java.Optional.fromNullable(s.orNull),
      GroupStateTimeout.ProcessingTimeTimeout,
      nowMs, org.apache.spark.api.java.Optional.empty[Long](), timedOut)

  private def run(s: TestGroupState[KeyState], recs: TaggedRec*): Seq[PairOut] =
    FaithfulLeftJoin.processKey(1L, recs.iterator, s,
      bandMs, retentionMs, timeoutMs).toSeq

  private def l(v: String, ts: Long) = TaggedRec(1L, v, new Timestamp(ts), true)
  private def r(v: String, ts: Long) = TaggedRec(1L, v, new Timestamp(ts), false)

  test("left with in-window right joins per pair; no pending scheduled") {
    val s = state(None, 1000L)
    val out = run(s, r("right", 10L), l("left_1", 1L), l("left_2", 20L))
    assert(out.map(p => (p.lvalue, p.rvalue)) ===
      Seq(("left_1", Some("right")), ("left_2", Some("right"))))
    assert(s.get.pending.isEmpty)
  }

  test("unmatched left schedules a pending timeout with arrival deadline") {
    val s = state(None, 1000L)
    val out = run(s, l("left", 1L))
    assert(out.isEmpty)
    assert(s.get.pending === List(Pending("left", 1L, 1000L + timeoutMs)))
    assert(s.getTimeoutTimestampMs.get() === 1000L + timeoutMs)
  }

  test("timer fire emits joiner(l, null) with the LEFT's event ts") {
    // ref `LeftJoinOnTimeoutBuilder.java:165-168`: timeout record keeps l.ts
    val s0 = state(None, 1000L)
    run(s0, l("left", 42L))
    val s1 = state(s0.getOption, 1000L + timeoutMs + 1, timedOut = true)
    val out = run(s1)
    assert(out === Seq(PairOut(1L, "left", None, new Timestamp(42L))))
    assert(!s1.exists || s1.get.pending.isEmpty)
  }

  test("key-level cancel quirk: a join output cancels ALL pending lefts, " +
       "even one whose own window excludes the joining right") {
    // SURVEY.md §2.3-3 (`ScheduledStateStore.java:87-115`)
    val s = state(None, 1000L)
    val out1 = run(s, l("far_left", 1L)) // pending; window [−99, 101]
    assert(out1.isEmpty && s.get.pending.nonEmpty)
    // right at ts 500 joins a NEW left at 450 — far_left's window excludes
    // ts 500, yet its pending emission is cancelled too
    val s2 = state(s.getOption, 1100L)
    val out2 = FaithfulLeftJoin.processKey(1L,
      Iterator(l("near_left", 450L), r("right", 500L)), s2,
      bandMs, retentionMs, timeoutMs).toSeq
    assert(out2.map(p => (p.lvalue, p.rvalue)) === Seq(("near_left", Some("right"))))
    assert(s2.get.pending.isEmpty, "far_left's pending timeout must be cancelled")
  }

  test("late right within band still pairs with an already-fired left " +
       "(at-least-once divergence preserved)") {
    // SURVEY.md §2.3-6: both `l+` and `l+r` can appear in the reference
    val s0 = state(None, 1000L)
    run(s0, l("left", 100L))
    val s1 = state(s0.getOption, 1000L + timeoutMs + 1, timedOut = true)
    val fired = run(s1) // timeout fired
    assert(fired.head.rvalue.isEmpty)
    val s2 = state(s1.getOption, 1500L)
    val out = run(s2, r("right", 150L)) // in-band right arrives after fire
    assert(out === Seq(PairOut(1L, "left", Some("right"), new Timestamp(100L))))
  }

  test("retention evicts join state by stream time") {
    val s = state(None, 1000L)
    run(s, l("old", 0L))
    val s2 = state(s.getOption, 2000L)
    run(s2, l("new", retentionMs + bandMs + 1000L))
    assert(s2.get.lefts.map(_._1) === List("new"))
  }

  test("end-to-end: flatMapGroupsWithState fires wall-clock timeouts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = LeftJoinOnTimeoutConfig(Duration.ofMillis(100),
      Duration.ofMillis(300), timeout = Some(Duration.ofMillis(400)))
    val ls = MemoryStream[Rec]; val rs = MemoryStream[Rec]
    val out = FaithfulLeftJoin(ls.toDF(), rs.toDF(),
      LeftJoinOnTimeout.testJoiner, cfg)
    val q = out.writeStream.format("memory").queryName("faithful_out")
      .outputMode("append").start()
    try {
      ls.addData(Rec(1L, "left_1", new Timestamp(1000L)))
      rs.addData(Rec(1L, "right", new Timestamp(1010L)))
      ls.addData(Rec(7L, "lonely", new Timestamp(5000L)))
      // NO processAllAvailable: with processing-time timers armed the
      // engine keeps scheduling micro-batches on its own (state-operator
      // shouldRunAnotherBatch), and processAllAvailable can block against
      // that churn. Poll the sink with a deadline instead — the Awaitility
      // pattern of the reference (`LeftJoinOnTimeoutTest.java:221-235`).
      def rows(): Seq[(Long, String)] = spark.table("faithful_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val deadline = System.currentTimeMillis() + 60000L
      var got = rows()
      while (!(got.contains((1L, "left_1+right")) && got.contains((7L, "lonely+")))
             && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        got = rows()
      }
      assert(got.contains((1L, "left_1+right")), s"missing join row: $got")
      assert(got.contains((7L, "lonely+")), s"missing timeout row: $got")
    } finally q.stop()
  }
}
