package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * JSONL / CSV interchange formats — what a 100-TB ingest actually
 * STARTS from (web-crawl dumps, API exports, labeling-vendor
 * deliveries) before it ever becomes parquet. Two invariants make
 * these scale:
 *
 *  - **Schema-explicit reads.** `spark.read.json/csv` without a schema
 *    runs a FULL INFERENCE PASS over the input before the real scan —
 *    at 100 TB that is a second 100-TB read. Both roundtrip helpers
 *    read back with the writer's schema, one pass, no inference.
 *  - **Splittability.** JSONL escapes `\n` inside values, so the file
 *    splits on raw newlines at any byte offset — free-text columns
 *    ride JSONL. CSV with embedded newlines needs `multiLine=true`,
 *    which makes each file a single non-splittable task — so the CSV
 *    path here is for SCALAR exports only, and [[formatRoundtrip]]'s
 *    CSV leg carries no text column by design (the spec pins the
 *    escaping semantics of both formats, including that divergence).
 *
 * Neither format pushes predicates into the scan the way parquet does
 * (row-group stats don't exist) — both legs aggregate AFTER a full
 * deserialize, which is honest: the operator's point is ingest
 * fidelity, and the very next step of a real pipeline is writing
 * parquet ([[Tables]], [[Partitioned]], [[Bucketing]]).
 */
object TextFormats {

  /** Write `df` as JSONL and read it back schema-explicit (one pass,
   * no inference). Partition-parallel on both sides. */
  def jsonRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Write `df` as headered CSV and read it back schema-explicit.
   * Scalar columns only at scale — see the splittability note above.
   * The WRITER's whitespace trimming (`ignoreLeading/TrailingWhiteSpace`
   * default TRUE on write, unlike read) is disabled — a faithful
   * roundtrip must not silently trim padded values. */
  def csvRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    df.sparkSession.read.schema(df.schema).option("header", "true").csv(path)
  }

  /** Write `df` as ORC and read it back — the OTHER columnar format a
   * warehouse migration hands you (Hive estates are ORC). Unlike the
   * text formats it is self-describing (schema in the footer — the
   * explicit schema here asserts writer/reader agreement rather than
   * skipping an inference pass), splittable by stripe, and its
   * min/max stripe stats serve predicate pushdown like parquet's row
   * groups — so text columns ride it losslessly with no escaping
   * layer at all. */
  def orcRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** Oracle-checked end-to-end proof over `documents`: the corpus goes
   * parquet → JSONL → DataFrame (text RIDES the JSON leg; its length
   * is recomputed from the ROUNDTRIPPED text), parquet → CSV →
   * DataFrame (scalars only), and parquet → ORC → DataFrame (full
   * fidelity, text included), then each leg aggregates per language.
   * All legs must agree with each other AND with the oracle that
   * reads the parquet directly — any escaping or type-mapping defect
   * in any format shows up as a count or char-sum drift. */
  def formatRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_fmt_rt").getPath
    def perLang(df: DataFrame, fmt: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("bigint")).as("total_chars"))
        .withColumn("format", lit(fmt))
    val viaJson = perLang(jsonRoundtrip(
      docs.select(col("doc_id"), col("text"), col("lang"), col("source")),
      s"$base/json"), "json")
    val viaOrc = perLang(orcRoundtrip(
      docs.select(col("doc_id"), col("text"), col("lang"), col("source")),
      s"$base/orc"), "orc")
    val viaCsv = csvRoundtrip(
        docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        s"$base/csv")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .withColumn("format", lit("csv"))
    viaJson.unionByName(viaCsv).unionByName(viaOrc)
      .select(col("format"), col("lang"), col("n_docs"), col("total_chars"))
  }

  /** DuckDB twin: the parquet-side per-language aggregate, one row per
   * format (the formats must be indistinguishable from the source). */
  def formatRoundtripSql: String =
    """SELECT f.format, d.lang, count(*) AS n_docs,
      |       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
      |FROM documents d
      |CROSS JOIN (SELECT 'json' AS format UNION ALL SELECT 'csv'
      |            UNION ALL SELECT 'orc') f
      |GROUP BY f.format, d.lang""".stripMargin
}
