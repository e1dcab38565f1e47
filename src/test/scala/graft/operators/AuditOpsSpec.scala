package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.Tables

/** The round-9 audit family: FK referential integrity, per-column
 * schema-health profile, and embedding-space decontamination. */
class AuditOpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("fk edge audit: orphan rows and distinct dangling keys counted exactly") {
    // child: key 1 ok ×2, key 9 dangling ×3, key 8 dangling ×1, NULL fk ×1
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(9L),
      Some(8L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Relational.fkEdgeAudit("t", child, "fk", parent, "pk").collect()(0)
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 7L, "n_children counts every child row incl. NULL fk")
    assert(r.getLong(2) === 5L, "orphans: 3×9 + 1×8 + 1×NULL")
    assert(r.getLong(3) === 3L, "distinct dangling keys: {9, 8, NULL}")
  }

  test("fk orphans over the real star schema: clean load, exact child counts") {
    val rows = Relational.fkOrphans(spark, dir).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getLong(2) === 0L, s"edge ${r.getString(0)} has orphans")
      assert(r.getLong(3) === 0L, s"edge ${r.getString(0)} has dangling keys")
    }
    val byEdge = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEdge("lineitem.l_orderkey->orders") ===
      Tables.lineitem(spark, dir).count())
    assert(byEdge("events.user_id->customer") ===
      Tables.events(spark, dir).count())
  }

  test("null profile: NULLs, blanks and distincts counted exactly per column") {
    val docs = Seq(
      (Some(1L), Some("hello"), Some("en"), Some("web"), Some(5L)),
      (Some(2L), Some("  "), Some("en"), Some("web"), Some(2L)),
      (Some(3L), None: Option[String], Some("de"), None: Option[String], Some(0L)),
      (None: Option[Long], Some("hello"), None: Option[String], Some("book"), None: Option[Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val prof = Corpus.nullProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(prof.keySet === Set("doc_id", "text", "lang", "source", "n_chars"))
    prof.values.foreach { case (n, _, _, _) => assert(n === 4L) }
    assert(prof("doc_id") === ((4L, 1L, 0L, 3L)))
    assert(prof("text") === ((4L, 1L, 1L, 2L)), "blank '  ' counted, distinct ignores NULL")
    assert(prof("lang") === ((4L, 1L, 0L, 2L)))
    assert(prof("source") === ((4L, 1L, 0L, 2L)))
    assert(prof("n_chars") === ((4L, 1L, 0L, 3L)))
  }

  test("null profile on the real documents table: no NULLs, sane cardinalities") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val prof = Corpus.nullProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(prof("doc_id") === ((n, 0L, 0L, n)), "doc_id is a unique non-null key")
    assert(prof("lang")._4 < n / 2, "lang is low-cardinality")
  }

  test("semantic decontaminate: max/count/verdict recompute on crafted vectors") {
    val dim = VectorOps.Dim
    def unit(at: Int): Array[Float] = Array.tabulate(dim)(i => if (i == at) 1.0f else 0.0f)
    // id 0 is inside the bounded query set; 1 and 2 are corpus-only.
    val embs = Seq(
      (0L, unit(0), 0), // the "eval" vector
      (1L, unit(0), 0), // exact semantic copy  -> cos 1
      (2L, unit(1), 0)) // orthogonal           -> cos 0
      .toDF("vec_id", "embedding", "label")
    val rows = VectorOps.semanticDecontaminate(embs).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(0) === 0L)
    assert(r.getDouble(1) === 1.0, "nearest-corpus cosine")
    assert(r.getLong(2) === 1L, "exactly one vector above the threshold")
    assert(r.getBoolean(3))
  }

  test("hourly autocorr: linear ramp ~1, constant series NULL, alternating negative") {
    import java.sql.Timestamp
    def hour(h: Int) = Timestamp.valueOf(f"2026-01-01 ${h}%02d:00:00")
    // ramp: 1,2,3,4 events in hours 0..3; const: 2,2,2; alt: 1,5,1,5
    val rows =
      (0 until 4).flatMap(h => Seq.fill(h + 1)(("ramp", hour(h)))) ++
      (0 until 3).flatMap(h => Seq.fill(2)(("const", hour(h)))) ++
      (0 until 4).flatMap(h => Seq.fill(if (h % 2 == 0) 1 else 5)(("alt", hour(h))))
    val events = rows.toDF("event_type", "ts")
    val r = Relational.hourlyAutocorrFrom(events).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(r("ramp")._1 === 3L)
    assert(math.abs(r("ramp")._2.get - 1.0) < 1e-12, "perfectly linear series")
    assert(r("const")._2.isEmpty, "zero variance must yield NULL, not NaN")
    assert(r("alt")._2.get < -0.9, "alternating series is strongly anti-persistent")
  }

  test("dedup savings: per-source rollup recomputes from the labeling + keepers") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, dir)
    val pairs = TextDedup.minhashLsh(docs)
    val labeled = DedupClusters.assign(docs, pairs)
    val keep = DedupClusters.keepersFromLabeled(labeled, docs)
      .select(col("cluster_id"), col("keeper_id"))
    val expect = labeled
      .join(docs.select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).as("n_toks")), "doc_id")
      .join(keep, Seq("cluster_id"), "left")
      .collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rs) =>
        val dups = rs.filter(r => !r.isNullAt(r.fieldIndex("keeper_id")) &&
          r.getAs[Long]("keeper_id") != r.getAs[Long]("doc_id"))
        src -> ((rs.length.toLong, rs.map(_.getAs[Long]("n_toks")).sum,
          dups.length.toLong, dups.map(_.getAs[Long]("n_toks")).sum))
      }
    val got = DedupClusters.dedupSavings(docs, pairs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (src, (nd, nt, ndd, dt)) =>
      val g = got(src)
      assert((g._1, g._2, g._3, g._4) === ((nd, nt, ndd, dt)), s"source $src")
      assert(g._5 === dt.toDouble / nt.toDouble, s"savings_rate $src")
    }
    assert(got.values.exists(_._3 > 0L), "the corpus has planted near-dups")
  }

  test("semantic decontaminate on the real table: verdict consistent, " +
    "contaminated queries exist (planted near-dups)") {
    val rows = VectorOps.semanticDecontaminate(Tables.embeddings(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getDouble(1) >= VectorOps.ContamSim))
      assert((r.getLong(2) >= 1L) === r.getBoolean(3),
        "n_contam >= 1 exactly when the verdict fires")
    }
  }
}
