package graft.operators

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class AsOfJoinSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def df(rows: (Long, String, Long)*): DataFrame =
    rows.map { case (k, v, ts) => (k, v, new Timestamp(ts)) }
      .toDF("key", "value", "ts")

  private def result(out: DataFrame): Seq[(Long, String, Option[String], Long)] =
    out.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getTimestamp(3).getTime))
      .toSeq.sorted

  private val horizon = Duration.ofSeconds(10)

  test("backward as-of picks the latest right at or before the left ts") {
    val out = AsOfJoin.backward(
      df((1L, "l1", 5000L), (1L, "l2", 12000L), (2L, "lonely", 5000L)),
      df((1L, "r_a", 1000L), (1L, "r_b", 6000L)),
      horizon)
    assert(result(out) === Seq(
      (1L, "l1", Some("r_a"), 5000L),   // r_b at 6000 is later than l1
      (1L, "l2", Some("r_b"), 12000L),
      (2L, "lonely", None, 5000L)))
  }

  test("rights beyond the horizon do not match") {
    val out = AsOfJoin.backward(
      df((1L, "l", 30000L)),
      df((1L, "old", 1000L)),
      horizon)
    assert(result(out) === Seq((1L, "l", None, 30000L)))
  }

  test("a right at exactly the left ts matches; equal-ts rights break ties by value") {
    val out = AsOfJoin.backward(
      df((1L, "l", 5000L)),
      df((1L, "r_x", 5000L), (1L, "r_y", 5000L)),
      horizon)
    assert(result(out) === Seq((1L, "l", Some("r_y"), 5000L)))
  }

  test("skew: a hot key holding 80% of lefts salts across sub-partitions " +
       "with output identical to the unsalted plan") {
    // mirrors LjotBatchSpec's hot-key pin: one key owning most of the
    // stream is the 100 TB failure mode — for the window shape AQE's
    // skew-join split does NOT apply, so the salt is the only defense
    val rnd = new scala.util.Random(13)
    def rows(n: Int): List[(Long, String, Long)] =
      List.tabulate(n) { i =>
        val k = if (rnd.nextInt(10) < 8) 7L else 1L + rnd.nextInt(5)
        (k, s"v$i", rnd.nextLong(40000L))
      }
    val ls = rows(3000); val rs = rows(300)
    val unsalted = result(AsOfJoin.backward(df(ls: _*), df(rs: _*), horizon))
    val salted = AsOfJoin.backward(df(ls: _*), df(rs: _*), horizon, saltBuckets = 8)
    assert(result(salted) === unsalted)
    // per-row reference check, independent of both plans
    val want = ls.map { case (k, lv, lts) =>
      val eligible = rs.filter { case (rk, _, rts) =>
        rk == k && rts <= lts && rts >= lts - horizon.toMillis }
      val best = if (eligible.isEmpty) None
        else Some(eligible.maxBy { case (_, rv, rts) => (rts, rv) }._2)
      (k, lv, best, lts)
    }.sorted
    assert(unsalted === want)
    // the salted window must actually partition on (key, salt)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(key") && plan.contains("salt"),
      s"expected a (key, salt) window partitioning in:\n$plan")
  }

  test("property: as-of output matches a per-row reference implementation " +
       "on randomized inputs (fixed seed)") {
    val rnd = new scala.util.Random(42)
    def randRows(n: Int): List[(Long, String, Long)] =
      List.fill(n)((1L + rnd.nextInt(5), "v" + (100 + rnd.nextInt(900)),
        rnd.nextLong(40000L)))
    for (_ <- 1 to 5) {
      val ls = randRows(60); val rs = randRows(60)
      val got = result(AsOfJoin.backward(df(ls: _*), df(rs: _*), horizon))
      val want = ls.map { case (k, lv, lts) =>
        val eligible = rs.filter { case (rk, _, rts) =>
          rk == k && rts <= lts && rts >= lts - horizon.toMillis }
        val best = if (eligible.isEmpty) None
          else Some(eligible.maxBy { case (_, rv, rts) => (rts, rv) }._2)
        (k, lv, best, lts)
      }.sorted
      assert(got === want)
    }
  }

  test("forward as-of picks the earliest right at or after the left ts") {
    val out = AsOfJoin.forward(
      df((1L, "l1", 5000L), (1L, "l2", 12000L), (2L, "lonely", 5000L)),
      df((1L, "r_a", 6000L), (1L, "r_b", 13000L)),
      horizon)
    assert(result(out) === Seq(
      (1L, "l1", Some("r_a"), 5000L),   // r_a at 6000 is the nearest following
      (1L, "l2", Some("r_b"), 12000L),  // r_a at 6000 is in the past
      (2L, "lonely", None, 5000L)))
  }

  test("forward: rights beyond the horizon do not match; a right at exactly " +
       "the left ts matches with ties broken by SMALLEST value") {
    val far = AsOfJoin.forward(df((1L, "l", 1000L)), df((1L, "late", 30000L)), horizon)
    assert(result(far) === Seq((1L, "l", None, 1000L)))
    val tie = AsOfJoin.forward(
      df((1L, "l", 5000L)),
      df((1L, "r_x", 5000L), (1L, "r_y", 5000L)),
      horizon)
    assert(result(tie) === Seq((1L, "l", Some("r_x"), 5000L)))
  }

  test("forward property: matches a per-row reference on randomized inputs, " +
       "salted plan included, and uses the O(n) accumulating frame") {
    val rnd = new scala.util.Random(7)
    def randRows(n: Int): List[(Long, String, Long)] =
      List.fill(n)((1L + rnd.nextInt(5), "v" + (100 + rnd.nextInt(900)),
        rnd.nextLong(40000L)))
    def reference(ls: List[(Long, String, Long)], rs: List[(Long, String, Long)]) =
      ls.map { case (k, lv, lts) =>
        val eligible = rs.filter { case (rk, _, rts) =>
          rk == k && rts >= lts && rts <= lts + horizon.toMillis }
        val best = if (eligible.isEmpty) None
          else Some(eligible.minBy { case (_, rv, rts) => (rts, rv) }._2)
        (k, lv, best, lts)
      }.sorted
    for (_ <- 1 to 5) {
      val ls = randRows(60); val rs = randRows(60)
      assert(result(AsOfJoin.forward(df(ls: _*), df(rs: _*), horizon)) === reference(ls, rs))
    }
    val ls = randRows(400); val rs = randRows(100)
    val salted = AsOfJoin.forward(df(ls: _*), df(rs: _*), horizon, saltBuckets = 4)
    assert(result(salted) === reference(ls, rs))
    // the desc-sort rewrite must keep the accumulating preceding frame —
    // an unboundedfollowing frame here would be O(n^2) per partition
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("unboundedpreceding") && !plan.contains("unboundedfollowing"),
      s"expected an accumulating (unboundedpreceding, currentrow) frame in:\n$plan")
  }
}
