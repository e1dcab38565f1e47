package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Proof that the AUTOMATIC half of the skew story works as claimed:
 * `skew_profile` diagnoses hot keys, `skew_join_salted` is the manual
 * mitigation, and AQE's OptimizeSkewedJoin is the runtime one — this
 * spec pins that the runtime split actually FIRES on a skewed shuffle
 * join (the plan claims in `Relational.saltedSegmentJoin`'s docs and
 * SURVEY §2.2 reference it, but nothing asserted it until now).
 *
 * The thresholds are scaled down to test size: a partition is split
 * when it exceeds skewedPartitionFactor × median AND the byte
 * threshold; production defaults (256 MB) would obviously never
 * trigger on a 50k-row fixture. */
class AqeSkewSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's shuffle partition (skew=true in the final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // broadcasting the small side would dissolve the shuffle join the
      // optimization targets — force a shuffle join both at plan time
      // and at AQE re-plan time
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // 80% of the fact rows on one key; 40-byte payload makes the hot
      // partition comfortably exceed the scaled-down skew threshold
      val pad = "x" * 40
      val fact = spark.range(0, 50000).select(
        when(col("id") % 5 === 0, col("id") % 97).otherwise(lit(7L)).as("key"),
        concat(lit(pad), col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("key"),
        concat(lit("d"), col("id").cast("string")).as("attr"))
      val joined = fact.join(dim, Seq("key"))
      // collect() executes THIS DataFrame's own QueryExecution — count()
      // would plan a separate aggregate query, leaving this plan
      // un-executed (isFinalPlan=false) with no AQE re-plan to inspect
      assert(joined.collect().length === 50000,
        "every fact key exists in the dimension")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not fire:\n$finalPlan")
    }
  }

  test("the same join without skew handling leaves the hot partition whole") {
    withConfs(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.range(0, 50000).select(
        when(col("id") % 5 === 0, col("id") % 97).otherwise(lit(7L)).as("key"),
        col("id").cast("string").as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("key"),
        concat(lit("d"), col("id").cast("string")).as("attr"))
      val joined = fact.join(dim, Seq("key"))
      assert(joined.collect().length === 50000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("skew=true"),
        s"control run must not skew-split:\n$finalPlan")
    }
  }
}
