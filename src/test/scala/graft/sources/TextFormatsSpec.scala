package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Escaping fidelity of the JSONL / CSV roundtrip helpers on
 * adversarial content, and the splittability divergence the scale
 * notes claim: JSONL carries embedded newlines losslessly (escaped,
 * file stays line-splittable); default CSV does NOT (that is exactly
 * why formatRoundtrip's CSV leg is scalars-only). */
class TextFormatsSpec extends AnyFunSuite with SparkTestHarness {

  private lazy val base = Files.createTempDirectory("graft-fmt").toString

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    super.afterAll()
  }

  // quotes, commas, backslashes, tabs, unicode (incl. an astral pair),
  // leading/trailing spaces, empty string, NULL — every classic breaker
  // except the newline (tested separately: the formats DIVERGE on it)
  private val nasty = Seq(
    (1L, Some("""he said "hi", then left"""), Some("en")),
    (2L, Some("back\\slash\tand\ttabs"), Some("de")),
    (3L, Some("καλημέρα 世界 😀"), Some("el")),
    (4L, Some("  padded  "), Some("fr")),
    (5L, Some(""), Some("en")),
    (6L, None, None))

  private def toDf(rows: Seq[(Long, Option[String], Option[String])]) = {
    import spark.implicits._
    rows.toDF("id", "text", "lang")
  }

  private def byId(df: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  test("JSONL roundtrip is byte-faithful on adversarial strings") {
    val in = toDf(nasty)
    val out = byId(TextFormats.jsonRoundtrip(in, s"$base/json_nasty"))
    assert(out.size === nasty.length)
    nasty.foreach { case (id, text, lang) =>
      val r = out(id)
      assert(Option(r.getAs[String]("text")) === text, s"text drift for id=$id")
      assert(Option(r.getAs[String]("lang")) === lang, s"lang drift for id=$id")
    }
  }

  test("JSONL carries embedded newlines and stays line-splittable") {
    val rows = Seq((1L, Some("line one\nline two\r\nthree"), Some("en")))
    val rt = TextFormats.jsonRoundtrip(toDf(rows), s"$base/json_nl")
    assert(rt.head().getAs[String]("text") === rows.head._2.get)
    // splittability = the value's newlines were ESCAPED: every physical
    // line of the output is one complete JSON record
    val files = new java.io.File(s"$base/json_nl").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq).filter(_.nonEmpty)
    assert(lines.length === 1, "one record must be one physical line")
    assert(lines.head.contains("\\n"), "newline must be escaped in-line")
  }

  test("CSV roundtrip is faithful on scalar-safe strings (quotes, commas, unicode)") {
    // no embedded newlines — the documented scalars-only contract
    val safe = nasty
    val out = byId(TextFormats.csvRoundtrip(toDf(safe), s"$base/csv_nasty"))
    assert(out.size === safe.length)
    safe.foreach { case (id, text, lang) =>
      val r = out(id)
      // CSV cannot distinguish "" from NULL on read — both come back
      // NULL under Spark defaults; normalize the expectation for the
      // empty-string row (one more reason text columns ride JSONL)
      val expect = text match { case Some("") => None; case t => t }
      assert(Option(r.getAs[String]("text")) === expect, s"text drift for id=$id")
      assert(Option(r.getAs[String]("lang")) === lang, s"lang drift for id=$id")
    }
  }

  test("ORC roundtrip is byte-faithful on adversarial strings incl. newlines") {
    // ORC is columnar — no escaping layer exists to get wrong, so the
    // newline row rides along with the rest (the JSON/CSV divergence
    // does not apply)
    val rows = nasty :+ (7L, Some("line one\nline two\r\nthree"), Some("en"))
    val out = byId(TextFormats.orcRoundtrip(toDf(rows), s"$base/orc_nasty"))
    assert(out.size === rows.length)
    rows.foreach { case (id, text, lang) =>
      val r = out(id)
      assert(Option(r.getAs[String]("text")) === text, s"text drift for id=$id")
      assert(Option(r.getAs[String]("lang")) === lang, s"lang drift for id=$id")
    }
  }

  test("formatRoundtrip legs agree with the parquet source at sf0.001") {
    val df = TextFormats.formatRoundtrip(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val direct = Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy("lang").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(direct.nonEmpty)
    direct.foreach { case (lang, agg) =>
      assert(rows(("json", lang)) === agg, s"json leg drift for $lang")
      assert(rows(("csv", lang)) === agg, s"csv leg drift for $lang")
      assert(rows(("orc", lang)) === agg, s"orc leg drift for $lang")
    }
    assert(rows.size === 3 * direct.size)
  }
}
