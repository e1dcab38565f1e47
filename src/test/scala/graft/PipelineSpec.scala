package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, DedupClusters, TextDedup, VectorOps}
import graft.sources.Tables

/** The README's "training-data pipeline in six lines", run end-to-end as
 * one composition — each operator is oracle-checked alone, but THIS is
 * how a user actually strings them together, and a column-name or
 * contract drift between stages would pass every per-operator check
 * while breaking the composition. */
class PipelineSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("corpus-preparation flow composes: dedup -> quality -> sample -> split") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()

    // near-dup pairs -> one canonical doc per duplicate cluster
    val pairs = TextDedup.minhashLsh(docs)
    val keep = DedupClusters.keepers(docs, pairs)
    val keepers = keep.select("keeper_id").collect().map(_.getLong(0)).toSet
    val clustered = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(keepers.nonEmpty && keepers.subsetOf(clustered),
      "every keeper comes from a dup cluster")

    // keep = corpus minus non-keeper cluster members, then quality-filter
    val deduped = docs.join(
      pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
        .join(keep.select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_anti"),
      Seq("doc_id"), "left_anti")
    val nDeduped = deduped.count()
    assert(nDeduped < nDocs && nDeduped >= nDocs - clustered.size + keepers.size)

    val clean = Corpus.qualityFilter(deduped).filter(col("passes"))
      .select("doc_id").join(deduped, "doc_id")
    assert(clean.count() > 0 && clean.count() <= nDeduped)

    // the embedding-view pass: semantic dedup's keep verdict composes by
    // vec_id exactly like the text keepers compose by doc_id
    val emb = Tables.embeddings(spark, dir)
    val sem = VectorOps.semanticDedup(emb).filter(col("keep"))
    assert(sem.count() > 0 && sem.count() < emb.count(),
      "semantic dedup keeps a strict, non-empty subset at sf0.001")

    // rebalance + deterministic split over the cleaned corpus
    val split = Corpus.sampleSplit(Corpus.stratifiedSample(clean)
      .join(clean, Seq("doc_id", "lang")))
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L),
      "train must dominate the split")
    assert(bySplit.values.sum === Corpus.stratifiedSample(clean).count(),
      "split partitions the sampled corpus exactly")
  }

  test("dedup pipeline labels once: keepers and split share one persisted labeling") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val docs = Tables.documents(spark, dir)
    val (labeled, keep, split) = Corpus.dedupPipeline(docs)
    try {
      assert(labeled.storageLevel.useMemory, "labeling must be persisted")
      labeled.count() // populate the cache before inspecting consumers
      // both consumers must read the SAME cached labeling: the cache
      // manager hands each reference a fresh InMemoryRelation instance
      // over the SAME underlying cached plan, so identity on cachedPlan
      // proves one shared materialization (the PlanGuardSpec convention)
      def cached(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cachedPlan }
      val kc = cached(keep)
      val sc = cached(split)
      assert(kc.nonEmpty && sc.nonEmpty, "consumers must read the cached labeling")
      assert(kc.exists(p => sc.exists(_ eq p)),
        "keepers and split must share ONE cached labeling")
      // ...and NO shingle/minhash stage survives outside the cache: the
      // plans above the cached scan are join+agg / pure projection only
      // (InMemoryRelation is a leaf — collect does not descend into it)
      Seq("keepers" -> keep, "split" -> split).foreach { case (name, df) =>
        val gen = df.queryExecution.optimizedPlan.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
        }
        assert(gen.isEmpty, s"$name re-runs a generator stage outside the cache")
      }
      // value parity with the independent checked queries
      val pairs = TextDedup.minhashLsh(docs)
      val keepAlone = DedupClusters.keepers(docs, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(keep.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        === keepAlone)
      val splitAlone = Corpus.clusterSafeSplit(DedupClusters.assign(docs, pairs))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
      assert(split.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
        === splitAlone)
    } finally labeled.unpersist()
  }

  test("epoch plan is invariant to input partitioning (the determinism contract)") {
    // every address in the plan is content-derived (quality signals,
    // fingerprints, salted hashes, hash-ordered positions) — so the SAME
    // corpus must yield the IDENTICAL epoch regardless of how the input
    // happens to be split across tasks. A nondeterministic order sneaking
    // into any stage (e.g. a row_number over a non-total order) breaks
    // reproducible training and shows up here as a differing address.
    val docs = Tables.documents(spark, dir)
    def planOf(parts: Int): Set[(Long, String, Int, Long)] =
      Corpus.epochPlan(docs.repartition(parts)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val p1 = planOf(1)
    assert(p1.nonEmpty)
    assert(planOf(7) === p1, "7-partition run must equal the single-partition run")
  }
}
