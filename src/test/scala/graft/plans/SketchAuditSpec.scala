package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.TextFunctions
import graft.operators.{Corpus, Relational}
import graft.sources.Tables

/** The three design-point error audits (HLL / GK / MG) that make the
 * rows-only sketches' accuracy oracle-visible: each emits exact,
 * SQL-derivable values plus sketch-dependent booleans the sketch's
 * guarantee forces true. These tests pin (a) the exact columns against
 * independently computed truth, (b) the booleans at two scales, and
 * (c) that each boolean really is computed FROM the sketch — the plan
 * contains the sketch aggregate, so a regression to `lit(true)` or a
 * broken sketch cannot stay green vacuously. */
class SketchAuditSpec extends AnyFunSuite with SparkTestHarness {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("hll_error_audit: exact column is truth, bound is the 3-sigma design point, all within") {
    dirs.foreach { dir =>
      val exact = Tables.events(spark, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val audit = Relational.hllErrorAudit(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap
      assert(audit.keySet === exact.keySet, s"$dir: one row per event_type")
      audit.foreach { case (et, (nExact, bound, within)) =>
        assert(nExact === exact(et), s"$dir $et: n_exact is the true distinct count")
        assert(bound === Relational.HllErrBound, s"$dir $et: audited envelope")
        assert(within, s"$dir $et: HLL++ estimate outside its 3-sigma envelope")
      }
    }
    // non-vacuity: within_bound is derived from the sketch aggregate
    val plan = Relational.hllErrorAudit(spark, dirs.head)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_count_distinct") || plan.contains("HyperLogLog"),
      "the audit must actually run the HLL sketch")
  }

  test("gk_error_audit: band arithmetic is exact, rank interval intersects at the merged eps") {
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val nByLang = docs.groupBy(col("lang")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = Corpus.gkErrorAudit(docs).collect()
      val qs = Set(0.25, 0.5, 0.9)
      assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSet ===
        nByLang.keySet.flatMap(l => qs.map(l -> _)), s"$dir: (lang x quantile) coverage")
      rows.foreach { r =>
        val (lang, q, n) = (r.getString(0), r.getDouble(1), r.getLong(2))
        assert(n === nByLang(lang), s"$dir $lang: n_docs is the true count")
        val lo = math.max(math.floor((q - Corpus.GkEps) * n).toLong, 1L)
        val hi = math.min(math.ceil((q + Corpus.GkEps) * n).toLong, n)
        assert(r.getLong(3) === lo && r.getLong(4) === hi,
          s"$dir $lang q=$q: band endpoints are pure arithmetic on exact counts")
        assert(r.getBoolean(5),
          s"$dir $lang q=$q: sketch quantile's rank interval left the +-eps band")
      }
    }
    val plan = Corpus.gkErrorAudit(Tables.documents(spark, dirs.head))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"),
      "the audit must actually run the GK sketch")
  }

  test("mg_error_audit: heavy set equals the exact definition, sketch guarantees certified") {
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val exact = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      val heavy = exact.filter { case (_, c) => c * (Corpus.MgK + 1) > n }
      assert(heavy.nonEmpty, s"$dir: corpus has true heavy hitters at k=${Corpus.MgK}")
      val rows = Corpus.mgErrorAudit(docs).collect()
      assert(rows.map(_.getString(0)).toSet === heavy.keySet,
        s"$dir: audit rows are EXACTLY the true heavy hitters")
      rows.foreach { r =>
        val tok = r.getString(0)
        assert(r.getLong(1) === heavy(tok), s"$dir $tok: f_exact is truth")
        assert(r.getLong(2) === n / (Corpus.MgK + 1), s"$dir $tok: Agarwal merge bound")
        assert(r.getBoolean(3), s"$dir $tok: heavy hitter missing from the merged sketch")
        assert(r.getBoolean(4), s"$dir $tok: estimate outside [f - n/(k+1), f]")
      }
    }
  }

  test("cm_error_audit: estimates equal the independently rebuilt grid's minima — " +
       "value-level, not bound-level") {
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val exact = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      // the relational grid reconstruction the DuckDB oracle performs,
      // done a third way here (Scala fold over exact frequencies)
      val grid = new Array[Long](Corpus.CmDepth * Corpus.CmWidth)
      exact.foreach { case (tok, cnt) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        for (i <- 0 until Corpus.CmDepth)
          grid(i * Corpus.CmWidth + CMSketch.bucket(digest, i, Corpus.CmWidth)) += cnt
      }
      def estOf(tok: String): Long = {
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (0 until Corpus.CmDepth)
          .map(i => grid(i * Corpus.CmWidth + CMSketch.bucket(digest, i, Corpus.CmWidth)))
          .min
      }
      val topK = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(Corpus.CmAuditK)

      val rows = Corpus.cmErrorAudit(docs).collect()
      assert(rows.map(_.getString(0)).toSeq === topK.map(_._1),
        s"$dir: audited candidates are the exact frequency head, count-then-token order")
      rows.foreach { r =>
        val tok = r.getString(0)
        assert(r.getLong(1) === exact(tok), s"$dir $tok: cnt is truth")
        assert(r.getLong(2) === estOf(tok),
          s"$dir $tok: est must equal the rebuilt grid's minimum (linearity)")
        assert(r.getLong(3) === estOf(tok) - exact(tok), s"$dir $tok: overcount")
        assert(r.getBoolean(4), s"$dir $tok: Count-Min undercounted")
      }
    }
    // non-vacuity: est is derived from the native sketch aggregate
    val plan = Corpus.cmErrorAudit(Tables.documents(spark, dirs.head))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("count_min"), "the audit must actually run the CM sketch")
  }

  test("count_min SQL surface: arity and parameter misuse are typed analysis errors") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a", "b", "a").toDF("t").createOrReplaceTempView("cm_toks")
    val ok = spark.sql(s"SELECT count_min(t, 2, 64) AS cm FROM cm_toks")
      .selectExpr("cm.n", "cm.counters").collect()
    assert(ok.head.getLong(0) === 3L, "n counts every added element")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count_min(t) FROM cm_toks").collect()
    }
    assert(e1.getMessage.contains("count_min"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      // depth 5 exceeds md5's four 32-bit slices
      spark.sql("SELECT count_min(t, 5, 64) FROM cm_toks").collect()
    }
    assert(e2.getMessage.contains("depth"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count_min(t, 2, 1) FROM cm_toks").collect()
    }
    assert(e3.getMessage.contains("width"))
  }
}
