package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.TextFunctions
import graft.operators.Corpus
import graft.sources.Tables

/** The Misra-Gries TypedImperativeAggregate: deterministic guarantees
 * (exact n, underestimate-only, ±n/(k+1) error, no missed heavy hitter)
 * pinned against exact token counts on the real corpus, at two
 * different parallelisms, plus the SQL registration path. */
class NativeAggregatesSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = Corpus.MgK

  private def sketch(parts: Int): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val docs = Tables.documents(spark, dir).repartition(parts)
    val agg = toCol(MisraGriesAgg(toExpr(TextFunctions.tokens(col("text"))), K)
      .toAggregateExpression())
    docs.agg(agg.as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.est"), col("e.n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  private lazy val exact: Map[String, Long] = Tables.documents(spark, dir)
    .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    .groupBy("tok").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val nTotal: Long = exact.values.sum

  for (parts <- Seq(1, 7)) {
    test(s"misra-gries guarantees hold at $parts partition(s)") {
      val sk = sketch(parts)
      assert(sk.nonEmpty && sk.size <= K)
      val bound = nTotal / (K + 1)
      sk.foreach { case (tok, (est, n)) =>
        assert(n === nTotal, "n is the exact stream length regardless of merging")
        val truth = exact.getOrElse(tok, 0L)
        assert(est <= truth, s"MG only underestimates: $tok est=$est truth=$truth")
        assert(truth - est <= bound, s"error bound: $tok est=$est truth=$truth bound=$bound")
      }
      exact.filter(_._2 > bound).keys.foreach { tok =>
        assert(sk.contains(tok), s"heavy hitter $tok (freq ${exact(tok)} > $bound) missing")
      }
    }
  }

  test("mg_hitters_raw query: certified rows only, certification is sound") {
    val rows = Corpus.mgHittersSketch(Tables.documents(spark, dir)).collect()
    assert(rows.nonEmpty, "the corpus has certified heavy hitters at k=" + K)
    rows.foreach { r =>
      val (tok, est, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est * (K + 1) > n, "query emits only certified hitters")
      assert(exact(tok) > n / (K + 1), s"certification sound for $tok")
    }
  }

  test("mg_heavy_hitters: sketch-then-exact-recount EQUALS the exact definition") {
    val rows = Corpus.mgHeavyHitters(Tables.documents(spark, dir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "the corpus has certified heavy hitters at k=" + K)
    rows.foreach { case (tok, cnt, n) =>
      assert(n === nTotal, "n is the exact stream length")
      assert(cnt === exact(tok), s"re-counted frequency is exact for $tok")
      assert(cnt * (K + 1) > n, "certified on the exact count")
    }
    // completeness: EVERY true heavy hitter is present (the merged sketch
    // cannot miss a token above n/(K+1), so the re-count set is total)
    val expected = exact.filter { case (_, c) => c * (K + 1) > nTotal }.keySet
    assert(rows.map(_._1).toSet === expected,
      "output set equals the exact heavy-hitter definition")
  }

  test("grouped mg raw sketch: per-language guarantees hold against exact counts") {
    val byLang = Corpus.mgHittersByLangSketch(Tables.documents(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(byLang.nonEmpty)
    val exactLang = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nLang = exactLang.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    byLang.foreach { case (lang, tok, est, n) =>
      assert(n === nLang(lang), s"per-language stream length for $lang")
      val truth = exactLang.getOrElse((lang, tok), 0L)
      assert(est <= truth && truth - est <= n / (K + 1), s"($lang, $tok)")
      assert(est * (K + 1) > n, "certified only")
    }
    assert(byLang.map(_._1).distinct.length > 1, "multiple language strata present")

    // the exact-recount form equals the per-language exact definition
    val rec = Corpus.mgHittersByLang(Tables.documents(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rec.foreach { case (lang, tok, cnt, n) =>
      assert(n === nLang(lang) && cnt === exactLang((lang, tok)))
      assert(cnt * (K + 1) > n)
    }
    val expected = exactLang.filter { case ((l, _), c) => c * (K + 1) > nLang(l) }
      .keySet
    assert(rec.map(t => (t._1, t._2)).toSet === expected,
      "grouped output set equals the exact per-language definition")
  }

  test("misra_gries is SQL-callable with arity and literal-k validation") {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_mg")
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT explode(misra_gries(token_seq(text), $K)) AS e FROM docs_mg")
      .select(col("e.token"), col("e.est")).collect()
    assert(viaSql.nonEmpty && viaSql.length <= K)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT misra_gries(token_seq(text)) FROM docs_mg").collect()
    }
    assert(err.getMessage.contains("misra_gries"))
    // k misuse is reported as a TYPE error, not a wrong-argument-count one
    val errType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT misra_gries(token_seq(text), 'x') FROM docs_mg").collect()
    }
    assert(errType.getCondition === "INVALID_PARAMETER_VALUE.INTEGER")
    val errFold = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT misra_gries(token_seq(text), length(text)) FROM docs_mg").collect()
    }
    assert(errFold.getCondition === "NON_FOLDABLE_ARGUMENT")
    // out-of-range literals: k = 0 and an Int.MaxValue-overflowing Long
    // both get the typed analysis error, never a raw require() or a
    // silently truncated toInt
    for (bad <- Seq("0", s"${Int.MaxValue.toLong + 1}L")) {
      val errRange = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT misra_gries(token_seq(text), $bad) FROM docs_mg").collect()
      }
      assert(errRange.getCondition === "INVALID_PARAMETER_VALUE.INTEGER", bad)
    }
    // non-array input is an analysis-time type error (ExpectsInputTypes),
    // not an executor-side ClassCastException
    val errInput = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT misra_gries(text, 4) FROM docs_mg").collect()
    }
    assert(errInput.getCondition != null &&
      errInput.getCondition.startsWith("DATATYPE_MISMATCH"))
  }

  // ---- KMV bottom-k distinct sketch ----------------------------------------

  private def kmvRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3)))
    }.toMap

  test("kmv_distinct_agg is merge-order-free: identical to the window twin at two parallelisms") {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val twin = kmvRows(graft.operators.Relational.kmvDistinctAggUsers(spark, dir))
    assert(twin.nonEmpty)
    for (parts <- Seq(1, 7)) {
      val events = Tables.events(spark, dir).repartition(parts)
      val sk = toCol(KmvDistinctAgg(
        toExpr(md5(col("user_id").cast("string"))), graft.operators.Relational.KmvK)
        .toAggregateExpression())
      val got = kmvRows(events.groupBy(col("event_type")).agg(sk.as("sk"))
        .select(col("event_type"), col("sk.m"), col("sk.hk"), col("sk.est")))
      assert(got === twin, s"KMV output must be exactly parallelism-independent ($parts parts)")
    }
  }

  test("kmv_distinct_agg estimator: exact below k, bounded relative error at/above k") {
    val k = graft.operators.Relational.KmvK
    val exactUsers = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = kmvRows(graft.operators.Relational.kmvDistinctAggUsers(spark, dir))
    assert(got.keySet === exactUsers.keySet)
    got.foreach { case (et, (m, hk, est)) =>
      val truth = exactUsers(et)
      if (truth < k) {
        assert(m === truth && hk == null && est === truth.toDouble,
          s"$et: below k the sketch IS the exact distinct count")
      } else {
        assert(m === k.toLong && hk != null, s"$et: sketch saturated at k")
        // RSE ≈ 1/√(k−1) ≈ 12.6% at k=64; 5σ gives a no-flake bound
        assert(math.abs(est - truth) <= 5.0 * truth / math.sqrt(k - 1.0),
          s"$et: est=$est truth=$truth outside the 5σ KMV error bound")
      }
    }
  }

  test("grouped KMV (per event_type x day): both branches exercised, error bound pinned") {
    // sf0.01, not the suite's usual sf0.001: per-(type, day) distinct
    // users there span 42-67 around k = 48, so BOTH the exact branch
    // (m < k) and the estimator branch (saturated sketch) run — the
    // branch coverage the checked query is sized for
    val d01 = "/root/testdata/sf0.01"
    val k = graft.operators.Relational.KmvDayK
    val exact = Tables.events(spark, d01)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    val got = graft.operators.Relational.kmvUsersByDay(spark, d01)
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(got.keySet === exact.keySet)
    var sawExact = 0
    var sawEst = 0
    got.foreach { case (key, (m, hk, est)) =>
      val truth = exact(key)
      if (truth < k) {
        sawExact += 1
        assert(m === truth && hk == null && est === truth.toDouble,
          s"$key: below k the sketch IS the exact distinct count")
      } else {
        sawEst += 1
        assert(m === k.toLong && hk != null, s"$key: sketch saturated at k")
        // RSE = 1/sqrt(k-1) ~ 14.6% at k=48; 5 sigma is the no-flake bound
        assert(math.abs(est - truth) <= 5.0 * truth / math.sqrt(k - 1.0),
          s"$key: est=$est truth=$truth outside the 5-sigma KMV error bound")
      }
    }
    assert(sawExact > 0, "sf0.01 must exercise the exact (m < k) branch")
    assert(sawEst > 0, "sf0.01 must exercise the estimator branch")
    // the audit query's relative error agrees with the design RSE at the
    // global k = 64: every event_type within 5 sigma
    val audit = graft.operators.Relational.kmvErrorAudit(spark, d01).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val rse = 1.0 / math.sqrt(graft.operators.Relational.KmvK - 1.0)
      assert(r.getDouble(4) <= 5.0 * rse,
        s"${r.getString(0)}: rel_err ${r.getDouble(4)} beyond 5x RSE $rse")
    }
  }

  test("kmv_distinct is SQL-callable with literal-k validation") {
    Tables.events(spark, dir)
      .select(md5(col("user_id").cast("string")).as("h"))
      .createOrReplaceTempView("events_kmv")
    GraftFunctions.register(spark)
    val row = spark.sql(
      s"SELECT kmv_distinct(h, ${graft.operators.Relational.KmvK}).est FROM events_kmv")
      .collect()
    assert(row.length === 1 && row(0).getDouble(0) > 0.0)
    val errFold = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_distinct(h, length(h)) FROM events_kmv").collect()
    }
    assert(errFold.getCondition === "NON_FOLDABLE_ARGUMENT")
    // k = 1 (the estimator needs k ≥ 2) and a truncating Long are both
    // typed analysis errors from the registration gate
    for (bad <- Seq("1", s"${Int.MaxValue.toLong + 1}L")) {
      val errRange = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT kmv_distinct(h, $bad) FROM events_kmv").collect()
      }
      assert(errRange.getCondition === "INVALID_PARAMETER_VALUE.INTEGER", bad)
    }
    // non-string input is an analysis-time type error, not an
    // executor-side ClassCastException
    val errInput = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_distinct(length(h), 8) FROM events_kmv").collect()
    }
    assert(errInput.getCondition != null &&
      errInput.getCondition.startsWith("DATATYPE_MISMATCH"))
  }

  test("kmv_mins is SQL-callable with the same literal-k and type validation as kmv_distinct") {
    Tables.events(spark, dir)
      .select(md5(col("user_id").cast("string")).as("h"))
      .createOrReplaceTempView("events_kmv_mins")
    GraftFunctions.register(spark)
    val arr = spark.sql("SELECT kmv_mins(h, 8) FROM events_kmv_mins")
      .head().getSeq[String](0)
    assert(arr.length === 8 && arr === arr.sorted, "sorted bottom-8 array")
    for (bad <- Seq("1", "length(h)")) {
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT kmv_mins(h, $bad) FROM events_kmv_mins").collect()
      }
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_mins(length(h), 8) FROM events_kmv_mins").collect()
    }
  }

  test("kmv_mins composition: window merge of per-day sketches equals the raw-window sketch") {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val k = 16
    val ev = Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("bigint").as("day"),
        md5(col("user_id").cast("string")).as("h"))
    val mins = toCol(KmvMinsAgg(toExpr(col("h")), k).toAggregateExpression())
    val daySk = ev.groupBy("day").agg(mins.as("mins")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rawByDay = ev.distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(daySk.nonEmpty)
    // per-day array IS the sorted bottom-k of that day's distinct hashes
    daySk.foreach { case (d, arr) =>
      assert(arr === rawByDay(d).toSeq.sorted.take(k), s"day $d")
    }
    // the composition claim: for every 7-day window, bottom-k of the
    // CONCATENATED per-day arrays == bottom-k of the raw window union
    val days = daySk.keySet.toSeq.sorted
    days.foreach { dEnd =>
      val win = days.filter(d => d >= dEnd - 6 && d <= dEnd)
      val merged = win.flatMap(daySk).distinct.sorted.take(k)
      val raw = win.flatMap(rawByDay).distinct.sorted.take(k)
      assert(merged === raw, s"window ending $dEnd")
    }
  }

  test("kmv_rolling_users: every window's sketch matches one built from raw window data") {
    val got = graft.operators.Relational.kmvRollingUsers(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.getString(2)), r.getDouble(3))))
      .toMap
    val k = graft.operators.Relational.KmvK
    val uh = Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("bigint").as("day"),
        md5(col("user_id").cast("string")).as("h"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val days = uh.map(_._1).distinct.sorted
    assert(got.keySet === days.toSet, "one output row per observed day")
    days.foreach { dEnd =>
      val bot = uh.filter { case (d, _) => d >= dEnd - 6 && d <= dEnd }
        .map(_._2).distinct.sorted.take(k)
      val (m, hk, est) = got(dEnd)
      assert(m === bot.length.toLong, s"window $dEnd m")
      assert(hk === (if (bot.length == k) Some(bot.last) else None), s"window $dEnd hk")
      if (bot.length < k) assert(est === bot.length.toDouble, s"window $dEnd exact branch")
      else assert(est > 0.0, s"window $dEnd estimator branch")
    }
    // sf0.001 has only ~15 users, so every window above ran the EXACT
    // branch; the estimator branch needs the gate scale (sf0.01 windows
    // hold 134-150 distinct users > k = 64) — assert it saturates there
    assert(got.values.forall(_._2.isEmpty), "sf0.001 windows must stay below k")
    val gate = graft.operators.Relational.kmvRollingUsers(spark, "/root/testdata/sf0.01")
      .collect()
    assert(gate.nonEmpty && gate.forall(_.getLong(1) === k.toLong),
      "every sf0.01 window must saturate the sketch (estimator branch)")
    assert(gate.forall(r => r.getDouble(3) > k.toDouble),
      "saturated estimates must exceed k")
  }

  test("kmv overlap estimator: partial-overlap sets track the true union and intersection") {
    // the shared tables' user sets overlap FULLY at every SF (ρ = 1 edge,
    // covered by the checked kmv_overlap_audit); the estimator's interior
    // needs constructed sets: A = 0..1999, B = 1000..2999 →
    // |A ∪ B| = 3000, |A ∩ B| = 1000, ρ = 1/3
    val rows = (0 until 2000).map(u => ("purchase", u.toLong)) ++
               (1000 until 3000).map(u => ("error", u.toLong))
    val ev = rows.toDF("event_type", "user_id").repartition(7)
    val r = graft.operators.Relational.overlapAuditOf(ev, "purchase", "error").head()
    val k = graft.operators.Relational.KmvK
    assert(r.getLong(0) === k.toLong, "union sketch saturates")
    assert(r.getLong(5) === 3000L && r.getLong(6) === 1000L, "exact audit columns")
    val (estU, estI) = (r.getDouble(3), r.getDouble(4))
    // KMV RSE = 1/sqrt(k-1) ~ 12.6%; allow 4 sigma on the union and a
    // looser 50% band on the intersection (its ratio estimator compounds
    // the union error with binomial noise on n_both/k)
    assert(math.abs(estU - 3000.0) / 3000.0 <= 4 / math.sqrt(k - 1.0), s"est_union $estU")
    assert(estI > 500.0 && estI < 1500.0, s"est_intersect $estI")
    // degenerate edges: disjoint sets estimate 0; identical sets estimate the union
    val disjoint = graft.operators.Relational.overlapAuditOf(
      ((0 until 500).map(u => ("purchase", u.toLong)) ++
       (500 until 1000).map(u => ("error", u.toLong))).toDF("event_type", "user_id"),
      "purchase", "error").head()
    assert(disjoint.getDouble(4) === 0.0 && disjoint.getLong(6) === 0L)
    val same = graft.operators.Relational.overlapAuditOf(
      ((0 until 800).map(u => ("purchase", u.toLong)) ++
       (0 until 800).map(u => ("error", u.toLong))).toDF("event_type", "user_id"),
      "purchase", "error").head()
    assert(same.getDouble(4) === same.getDouble(3), "identical sets: est_intersect = est_union")
  }
}
