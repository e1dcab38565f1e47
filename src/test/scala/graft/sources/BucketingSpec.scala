package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Bucketed co-located join: the repeated-join shape must be
 * EXCHANGE-FREE — bucket i of customer zips with bucket i of orders —
 * and value-identical to the plain shuffled join. */
class BucketingSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed-on-key join plans without any shuffle exchange") {
    val customer = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val orders = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    Bucketing.writeBucketed(customer, "c_custkey", 4, "b_customer")
    Bucketing.writeBucketed(orders, "o_custkey", 4, "b_orders")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_customer", "c_custkey",
        "b_orders", "o_custkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle; found ${exchanges.size} exchange(s) in\n" +
          joined.queryExecution.executedPlan)
      // value-identity against the plain (shuffled) join
      val expected = customer.join(orders, col("c_custkey") === col("o_custkey"))
      assert(joined.count() === expected.count())
      val a = joined.select(col("c_custkey"), col("o_totalprice"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      val b = expected.select(col("c_custkey"), col("o_totalprice"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(a.sameElements(b))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
