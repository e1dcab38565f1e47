package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.TextFunctions
import graft.plans.TokenWindowHash
import graft.sources.Tables

/** The native O(n) rolling token-hash kernel ([[TokenWindowHash]]) that
 * feeds `TextDedup.substrDedup` must induce EXACTLY the equality classes
 * of the md5-of-joined-slice fingerprint it replaced — only fingerprint
 * equality ever reaches the operator's output, so class identity on the
 * corpus is the whole swap contract (the DuckDB oracle still computes
 * the md5 form). */
class SubstrKernelSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"
  private val W = TextDedup.SubstrW

  /** (doc_id, p, native struct fp, md5 fp) for every stride-1 window of
   * the shared corpus. */
  private lazy val both = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= W)
    val native = toks
      .select(col("doc_id"),
        posexplode(toCol(TokenWindowHash(toExpr(col("toks")), W))).as(Seq("p0", "fpn")))
      .select(col("doc_id"), (col("p0") + 1).as("p"),
        concat_ws(":", col("fpn.h1"), col("fpn.h2")).as("fpn"))
    val md5f = toks
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("toks")) - lit(W) + lit(1)),
          k => md5(array_join(slice(col("toks"), k, lit(W)), " "))))
          .as(Seq("p0", "fpm")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("fpm"))
    native.join(md5f, Seq("doc_id", "p")).persist()
  }

  test("rolling fingerprints and md5 fingerprints induce identical equality classes") {
    val n = both.count()
    assert(n > 10000L, s"sf0.001 yields a five-figure window count, got $n")
    // bijection between the two fingerprint partitions: every md5 class
    // maps to exactly one native class and vice versa
    val m2n = both.groupBy("fpm").agg(countDistinct("fpn").as("k"))
      .filter(col("k") =!= 1).count()
    val n2m = both.groupBy("fpn").agg(countDistinct("fpm").as("k"))
      .filter(col("k") =!= 1).count()
    assert(m2n === 0L, "an md5 class split under the rolling kernel (missed equality)")
    assert(n2m === 0L, "a rolling class merged distinct md5 classes (hash collision)")
  }

  test("substrDedup output is unchanged by the kernel swap") {
    // the full pipeline rebuilt on the md5 windowing vs the shipped
    // (native-kernel) operator — identical rows
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= W)
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
    val win = toks
      .select(col("doc_id"), col("n"),
        posexplode(transform(sequence(lit(1), col("n") - lit(W) + lit(1)),
          k => md5(array_join(slice(col("toks"), k, lit(W)), " "))))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), col("n"), (col("p0") + 1).as("p"), col("fp"))
    val dupFp = win.select(col("fp"), col("doc_id")).distinct()
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= TextDedup.SubstrDfMin)
      .select("fp")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val isl = win.join(dupFp, Seq("fp"), "left_semi")
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(w) <= W, lit(0L)).otherwise(lit(1L)))
      .withColumn("island", sum(col("brk")).over(w))
    val ref = isl.groupBy(col("doc_id"), col("island"))
      .agg(max(col("n")).as("n"), min(col("p")).as("s"),
        max(col("p")).as("e"), count(lit(1)).as("nw"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("bigint").as("n_tokens"),
        sum(col("nw")).cast("bigint").as("n_dup_windows"),
        sum(col("e") - col("s") + lit(W)).cast("bigint").as("n_dup_tokens"),
        max(col("e") - col("s") + lit(W)).cast("bigint").as("max_run"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val got = TextDedup.substrDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(ref.nonEmpty, "sf0.001 has planted duplicated substrings")
    assert(got === ref)
  }

  test("modular arithmetic kernel: mulMod/powMod agree with BigInt") {
    val M = BigInt(TokenWindowHash.M61)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % TokenWindowHash.M61
      val b = math.abs(rnd.nextLong()) % TokenWindowHash.M61
      assert(BigInt(TokenWindowHash.mulMod(a, b)) === (BigInt(a) * BigInt(b)) % M)
    }
    (0 to 64).foreach { e =>
      assert(BigInt(TokenWindowHash.powMod(TokenWindowHash.B1, e)) ===
        BigInt(TokenWindowHash.B1).modPow(BigInt(e), M))
    }
  }
}
