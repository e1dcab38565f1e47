package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Alternating-star connected components vs a naive union-find reference
 * on randomized graphs, plus the shape cases iterative CC gets wrong
 * (chains needing label transitivity, empty input, singletons). */
class DedupClustersSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  /** Union-find reference: component min per node. */
  private def ufLabels(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private def sparkLabels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.components(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("randomized graphs match union-find (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 30 + rnd.nextInt(30)
      val m = rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = ufLabels(nodes, edges)
      val got = sparkLabels(edges)
      assert(got === expected, s"seed $seed: $m edges over $n ids")
    }
  }

  test("a long chain collapses to one component (transitivity)") {
    // 0-1, 1-2, ..., 98-99: the case pair-local dedup cannot see
    val chain = (0L until 99L).map(i => (i, i + 1))
    val got = sparkLabels(chain)
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 99L).toSet)
  }

  test("assign labels the whole corpus; singletons label themselves") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (3L, 5L)).toDF("id_a", "id_b")
    val got = DedupClusters.assign(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L, 5L -> 1L))
  }

  test("empty pair relation: every doc is its own cluster") {
    val docs = Seq(7L, 8L).toDF("doc_id")
    val pairs = spark.emptyDataFrame
      .withColumn("id_a", lit(0L)).withColumn("id_b", lit(0L))
      .filter(lit(false))
    val got = DedupClusters.assign(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(7L -> 7L, 8L -> 8L))
  }

  test("keepers: longest doc wins, ties to smallest id, singletons dropped") {
    val docs = Seq(
      (1L, "one two three four five"),          // cluster {1,3,5}: 3 has most tokens
      (2L, "lonely"),                           // singleton: excluded
      (3L, "one two three four five six seven"),
      (5L, "one two three four five six seven"), // ties 3 on tokens; 3 < 5 wins
      (8L, "aa bb"), (9L, "aa bb")              // cluster {8,9}: tie -> 8
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (8L, 9L)).toDF("id_a", "id_b")
    val got = DedupClusters.keepers(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 3L, 3L), (8L, 8L, 2L)))
  }

  test("end-to-end over minhash pairs: clusters refine the pair graph") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val pairs = TextDedup.minhashLsh(docs)
    val pairSet = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.nonEmpty)
    val labels = DedupClusters.assign(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc shares its partner's label
    pairSet.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // labels are component minima: a label never exceeds its member
    labels.foreach { case (node, label) => assert(label <= node) }
    // doc count preserved
    assert(labels.size === docs.count())
  }

  test("minhashLabels memoizes per (session, scan path) and matches assign") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val first = DedupClusters.minhashLabels(docs)
    // second call on an equivalent scan returns the SAME cached frame —
    // the minhash + CC stages never rebuild
    val second = DedupClusters.minhashLabels(graft.sources.Tables.documents(spark, dir))
    assert(first eq second, "labeling must be memoized for the same session + input path")
    // and the memoized labeling IS the uncached assign over minhash pairs
    val viaAssign = DedupClusters
      .assign(docs, TextDedup.minhashLsh(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMemo = first.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMemo === viaAssign)
    // a non-scan input (in-memory frame) must fall back to a fresh
    // labeling, not poison or reuse the cache
    import spark.implicits._
    val adhoc = Seq((1L, "aa bb cc dd ee ff gg hh ii jj kk ll"),
      (2L, "aa bb cc dd ee ff gg hh ii jj kk ll")).toDF("doc_id", "text")
    val l1 = DedupClusters.minhashLabels(adhoc)
    val l2 = DedupClusters.minhashLabels(adhoc)
    assert(!(l1 eq l2), "in-memory inputs are not memoizable (no stable scan key)")
    assert(l1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 1L)))
  }
}
