package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Partitioned layout: a partition-column filter must eliminate the
 * other partitions' FILES at plan time (not merely filter their rows),
 * and the round-trip must be value-identical. */
class PartitionedSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"

  test("partition-column filter prunes to that partition's files only") {
    val docs = Tables.documents(spark, dir)
    val path = Files.createTempDirectory("graft-part").toString
    try {
      Partitioned.write(docs, path, Seq("lang"))
      val back = Partitioned.read(spark, path)

      // round-trip value identity (partition col moves to the end; ids pin rows)
      val a = docs.select("doc_id", "lang", "n_chars").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      val b = back.select("doc_id", "lang", "n_chars").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(a.sameElements(b))

      // pruning: the filtered scan must OPEN only lang=en's files
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        val scans = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s }
        assert(scans.nonEmpty)
        scans.map(_.metrics("numFiles").value).sum
      }
      val total = filesRead(back)
      val en = filesRead(back.filter(col("lang") === "en"))
      val langs = docs.select("lang").distinct().count()
      assert(langs > 1L, "corpus must be multilingual for this test to bind")
      assert(en < total, s"expected pruning: read $en of $total files")
      // the partition filter must appear AS a partition filter (plan-time
      // directory pruning), not as a pushed data filter
      val scan = back.filter(col("lang") === "en").queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }.head
      assert(scan.partitionFilters.exists(_.toString.contains("lang")),
        s"lang filter missing from partitionFilters: ${scan.partitionFilters}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("write refuses a high-cardinality partition column") {
    val docs = Tables.documents(spark, dir)
    val path = Files.createTempDirectory("graft-part-bad").toString
    try {
      // doc_id is unique per row — exactly the id-column mistake the
      // guard exists for (ceiling bounded down to trip at test scale)
      val e = intercept[IllegalArgumentException] {
        Partitioned.write(docs, path, Seq("doc_id"), maxPartitions = 100L)
      }
      assert(e.getMessage.contains("low-cardinality"))
      assert(!Files.list(java.nio.file.Paths.get(path)).findFirst().isPresent,
        "guard must fire before any file is written")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }
}
