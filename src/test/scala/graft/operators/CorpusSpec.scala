package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.Tables

class CorpusSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quality filter: verdict is exactly the conjunction of its signals") {
    val qf = Corpus.qualityFilter(Tables.documents(spark, dir))
    val rows = qf.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getLong(1) >= Corpus.QfMinTokens &&
        r.getLong(1) <= Corpus.QfMaxTokens &&
        r.getDouble(2) >= Corpus.QfMinMeanWordLen &&
        r.getDouble(2) <= Corpus.QfMaxMeanWordLen &&
        r.getDouble(3) <= Corpus.QfMaxSymbolRatio &&
        r.getLong(4) >= Corpus.QfMinStopHits
      assert(r.getBoolean(5) === expect, s"row $r")
    }
    val passed = rows.count(_.getBoolean(5))
    assert(passed > 0 && passed < rows.length,
      s"thresholds must discriminate on this corpus: $passed/${rows.length}")
  }

  test("sample split: all three splits present, fractions near design") {
    val sp = Corpus.sampleSplit(Tables.documents(spark, dir))
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet === Set("train", "val", "test"))
    val trainFrac = counts("train") / n
    assert(trainFrac > 0.82 && trainFrac < 0.96, s"train frac $trainFrac")
    // buckets in range
    val bad = sp.filter(col("split_bucket") < 0 || col("split_bucket") > 255).count()
    assert(bad === 0L)
  }

  test("sample split is content-addressed: independent of the surrounding rows") {
    // the split of doc 42 computed over the full corpus equals the split
    // computed over a single-row relation — appends can never reshuffle
    // an existing doc's split (the property rand()-based splits lack)
    val full = Corpus.sampleSplit(Tables.documents(spark, dir))
      .filter(col("doc_id") === 42L).select("split").head().getString(0)
    val alone = Corpus.sampleSplit(Seq(42L).toDF("doc_id")).select("split").head().getString(0)
    assert(full === alone)
  }
}
