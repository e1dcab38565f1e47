package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class CountCacheSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  test("pure scan views share one cached count; count-changing plans stay fresh") {
    val dir = Files.createTempDirectory("graft-countcache").toString
    (1L to 7L).toDF("id").withColumn("v", col("id") * 2)
      .repartition(2).write.mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
    assert(CountCache.exactCount(df) === 7L)

    // Deleting the data files makes ANY further Spark job over this scan
    // fail, so a correct answer below can only come from the cache — a
    // deterministic no-job assertion, no listener races.
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .foreach(Files.delete)

    // row-preserving views (project / repartition / sort / alias) resolve
    // to the same root-path key and must hit the cache
    assert(CountCache.exactCount(df.select(col("v"))) === 7L)
    assert(CountCache.exactCount(df.repartition(3).as("t")) === 7L)
    assert(CountCache.exactCount(df.orderBy(col("id"))) === 7L)

    // a filter can change the row count → uncacheable → a real job → the
    // missing files surface as a failure instead of a silent stale count
    intercept[Exception] { CountCache.exactCount(df.filter(col("id") > 2)) }
  }
}
