package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** The bounded-Levenshtein → threshold-form rewrite: every comparison
 * shape (≤, <, mirrored ≥/>, =, and the INT→BIGINT cast the DataFrame
 * surface introduces) rewrites onto the banded DP, values identical to
 * the unbounded form; vacuous and already-thresholded predicates stay
 * untouched. Inputs must be datasource-backed: literals constant-fold
 * before any optimizer rule can be observed. */
class LevenshteinThresholdRuleSpec extends AnyFunSuite with SparkTestHarness {

  override def beforeAll(): Unit = {
    super.beforeAll()
    LevenshteinThresholdRule.register(spark)
    // deterministic word pool: distances to "alpha bravo" span 0..11,
    // straddling every bound used below, plus a NULL row for 3VL
    import spark.implicits._
    val rows = Seq(
      Some("alpha bravo"), Some("alpha brav"), Some("alpha bravoo"),
      Some("alpha brsvo"), Some("alphx brsvo"), Some("delta"),
      Some(""), None).map(t => (t, Some("alpha bravo")))
    rows.toDF("a", "b").write.mode("overwrite").parquet(dirPath)
    spark.read.parquet(dirPath).createOrReplaceTempView("lev_t")
  }

  private lazy val dirPath = Files.createTempDirectory("graft-lev").toString

  override def afterAll(): Unit = {
    detach()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirPath))
    super.afterAll()
  }

  private def detach(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinThresholdRule)

  /** Count of Levenshtein nodes in the optimized plan carrying a
   * threshold (the rewrite's fingerprint). */
  private def thresholded(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case l: Levenshtein if l.threshold.isDefined => n += 1
      case _ => ()
    }))
    n
  }

  private def run(sql: String): Seq[Option[Boolean]] =
    spark.sql(sql).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))

  test("every comparison shape rewrites and preserves values incl. NULLs") {
    val shapes = Seq(
      "levenshtein(a, b) <= 2", "levenshtein(a, b) < 2",
      "2 >= levenshtein(a, b)", "2 > levenshtein(a, b)",
      "levenshtein(a, b) = 1", "1 = levenshtein(a, b)",
      // the DataFrame-surface shape: distance cast to BIGINT, BIGINT bound
      "CAST(levenshtein(a, b) AS BIGINT) <= CAST(2 AS BIGINT)")
    for (p <- shapes) {
      val sql = s"SELECT $p FROM lev_t ORDER BY coalesce(a, '~zz')"
      val rewritten = spark.sql(sql)
      assert(thresholded(rewritten) >= 1,
        s"no rewrite for `$p` in:\n${rewritten.queryExecution.optimizedPlan}")
      val got = run(sql)
      detach()
      val stock = try {
        assert(thresholded(spark.sql(sql)) === 0)
        run(sql)
      } finally LevenshteinThresholdRule.register(spark)
      assert(got === stock, s"value drift for `$p`")
      assert(got.contains(None), s"NULL row must stay NULL for `$p`")
      assert(got.flatten.contains(true) && got.flatten.contains(false),
        s"pool must straddle the bound for `$p`")
    }
  }

  test("vacuous and already-thresholded predicates stay untouched") {
    // k < 0: always-false comparison left for constant folding
    assert(thresholded(spark.sql("SELECT levenshtein(a, b) <= -1 FROM lev_t")) === 0)
    // explicit threshold already present: nothing to do (fixpoint safety)
    val explicitThr = spark.sql("SELECT levenshtein(a, b, 2) >= 0 FROM lev_t")
    assert(thresholded(explicitThr) === 1)
    // the full distance alone (no bound) must not be touched
    assert(thresholded(spark.sql("SELECT levenshtein(a, b) FROM lev_t")) === 0)
  }

  test("threshold semantics match the docs: exact d when d <= k, -1 above") {
    // the soundness contract the rule relies on, pinned against Spark itself
    val rows = spark.sql(
      """SELECT levenshtein(a, b) AS d, levenshtein(a, b, 2) AS dt
        |FROM lev_t WHERE a IS NOT NULL""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, dt) = (r.getInt(0), r.getInt(1))
      if (d <= 2) assert(dt === d) else assert(dt === -1)
    }
  }
}
