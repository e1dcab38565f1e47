package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class LayoutSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("compact rewrites a many-small-files directory to the byte-derived " +
       "file count without losing rows") {
    val in = tmp("layout_in"); val out = tmp("layout_out")
    // 40 tiny files
    spark.range(0, 40000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(40).write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles === 40)
    // pick the target so the stat-derived count lands at 2-5 files
    val bytes = new java.io.File(in).listFiles.map(_.length).sum
    val parts = Layout.compact(spark, in, out, targetBytes = bytes / 3)
    assert(parts >= 2 && parts <= 5, s"parts $parts")
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === parts)
    assert(spark.read.parquet(out).count() === 40000L)
    // round-robin repartition balanced the rows (largest/smallest within 2x)
    val sizes = new java.io.File(out).listFiles.filter(_.getName.endsWith(".parquet"))
      .map(_.length)
    assert(sizes.max <= sizes.min * 2, s"unbalanced: ${sizes.toList}")
  }

  test("morton interleave places bit i of x at 2i and of y at 2i+1") {
    val out = spark.range(1).select(
      Layout.interleave(lit(0L), lit(0L)).as("zz"),
      Layout.interleave(lit(1L), lit(0L)).as("zx"),
      Layout.interleave(lit(0L), lit(1L)).as("zy"),
      Layout.interleave(lit(3L), lit(5L)).as("zm"))
      .head()
    assert(out.getLong(0) === 0L)
    assert(out.getLong(1) === 1L)  // x bit 0 -> z bit 0
    assert(out.getLong(2) === 2L)  // y bit 0 -> z bit 1
    // x=011, y=101 -> z bits: (y2 x2 y1 x1 y0 x0) = 1 0 0 1 1 1 = 39
    assert(out.getLong(3) === 39L)
  }

  test("z-order clustering bounds BOTH columns' per-file ranges where a " +
       "single-column sort leaves the other at full width") {
    // a 200x200 grid, shuffled
    val grid = spark.range(0, 40000).select(
      (col("id") % 200).as("x"), (col("id") / 200).cast("long").as("y"))
    val files = 16
    val zDir = tmp("layout_z"); val linDir = tmp("layout_lin")
    Layout.zorderBy(grid, "x", "y", zDir, files)
    grid.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    def widths(dir: String): (Double, Double) = {
      val perFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x") + 1).cast("double").as("wx"),
          (max("y") - min("y") + 1).cast("double").as("wy"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      (perFile.map(_._1).sum / perFile.length, perFile.map(_._2).sum / perFile.length)
    }
    // the per-file bounding AREA is conserved by any space-filling layout
    // (files partition the grid); the Z-order win is the per-file RANGE of
    // the dimension a single-column sort abandons: a filter on y prunes
    // ZERO linear-x files (every file spans the full y range) but most
    // z files (each covers a ~square curve cell)
    val (_, zWy) = widths(zDir)
    val (_, linWy) = widths(linDir)
    assert(linWy >= 199.0, s"linear-x files should span the full y range, got $linWy")
    assert(zWy * 2 < linWy, s"z mean y-width $zWy vs linear $linWy")
    // and the written data is intact
    assert(spark.read.parquet(zDir).count() === 40000L)
  }
}
