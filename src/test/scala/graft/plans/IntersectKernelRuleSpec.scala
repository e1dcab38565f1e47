package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.Tables

/** The guarded `size(array_intersect)` → ArrayIntersectSize rewrite:
 * fires exactly on provably-distinct inputs, preserves values, and
 * leaves duplicate-bearing arrays to the built-in (whose dedup
 * semantics the kernel does not share). Inputs must be datasource-
 * backed: literals and local relations constant-fold before any
 * optimizer rule can be observed. */
class IntersectKernelRuleSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
    IntersectKernelRule.register(spark)
  }

  override def afterAll(): Unit = {
    detach()
    super.afterAll()
  }

  // the shared session outlives this suite — other suites' plan
  // assertions must see the stock optimizer
  private def detach(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq IntersectKernelRule)

  private def kernelCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: ArrayIntersectSize => n += 1
      case _ => ()
    }))
    n
  }

  test("distinct-by-construction producers rewrite; value identical to the built-in") {
    Tables.documents(spark, dir).createOrReplaceTempView("ik_docs")
    val sql =
      """SELECT doc_id, size(array_intersect(
        |         word_shingles(text), word_shingles(substr(text, 1, 200)))) AS n
        |FROM ik_docs""".stripMargin
    val rewritten = spark.sql(sql)
    assert(kernelCount(rewritten) === 1,
      s"expected rewrite in:\n${rewritten.queryExecution.optimizedPlan}")
    val got = rewritten.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same query with the rule detached = stock array_intersect semantics
    detach()
    val stock = try {
      val df = spark.sql(sql)
      assert(kernelCount(df) === 0)
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    } finally IntersectKernelRule.register(spark)
    assert(got === stock)
    assert(got.values.exists(_ > 0), "overlapping prefixes must share shingles")
  }

  test("array_distinct inputs rewrite; raw attributes keep dedup semantics") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-ik").toString
    try {
      Seq((Seq("x", "x", "y"), Seq("x"))).toDF("a", "b")
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path).createOrReplaceTempView("ik_t")
      val safe = spark.sql(
        "SELECT size(array_intersect(array_distinct(a), array_distinct(b))) AS n FROM ik_t")
      assert(kernelCount(safe) === 1,
        s"expected rewrite in:\n${safe.queryExecution.optimizedPlan}")
      assert(safe.head().getInt(0) === 1)
      // an attribute may HOLD duplicates — unprovable, must not rewrite,
      // and the built-in's dedup semantics must survive ([x,x] ∩ [x] = 1)
      val raw = spark.sql("SELECT size(array_intersect(a, b)) AS n FROM ik_t")
      assert(kernelCount(raw) === 0,
        s"unsound rewrite in:\n${raw.queryExecution.optimizedPlan}")
      assert(raw.head().getInt(0) === 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }
}
