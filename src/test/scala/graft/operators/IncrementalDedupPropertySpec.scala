package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Property: over random corpora, [[TextDedup.incremental]] drops EXACTLY
 * the new-crawl docs that whole-union dedup would pair with an old doc —
 * `exact` for a fingerprint already in the corpus, `near` for a verified
 * minhash-LSH pair crossing the new/old boundary. (The documented
 * capped-band miss cannot trigger here: generated corpora are far below
 * [[TextDedup.MaxBucket]] postings per band.)
 *
 * Generated corpora plant all three populations: fresh docs, exact copies
 * of old docs, and single-token mutations of old docs. Docs are 30-40
 * tokens so one mutated token keeps trigram-shingle Jaccard at
 * (n-5)/(n+1) ≈ 0.84 — above the 0.8 verify threshold. */
class IncrementalDedupPropertySpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val vocab = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")

  private val docGen: Gen[String] =
    Gen.choose(30, 40).flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))

  /** (doc_id, text, source) rows: old docs under sources src1/src2, new
   * docs under [[TextDedup.IncrementalNewSource]]. */
  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    nOld <- Gen.choose(15, 25)
    nNew <- Gen.choose(8, 15)
    oldTexts <- Gen.listOfN(nOld, docGen)
    newTexts <- Gen.listOfN(nNew, Gen.frequency(
      4 -> docGen,                                             // fresh
      3 -> Gen.oneOf(oldTexts),                                // exact copy
      3 -> (for {                                              // near-dup
        base <- Gen.oneOf(oldTexts)
        toks = base.split(" ")
        i <- Gen.choose(0, toks.length - 1)
        w <- Gen.oneOf(vocab)
      } yield toks.updated(i, w).mkString(" "))))
  } yield {
    val olds = oldTexts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, if (i % 2 == 0) "src1" else "src2") }
    val news = newTexts.zipWithIndex.map { case (t, i) =>
      ((1000 + i).toLong, t, TextDedup.IncrementalNewSource) }
    olds ++ news
  }

  test("incremental dedup == union dedup restricted to new-x-old (5 seeds)") {
    for (seed <- 1 to 5) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val docs = corpus.toDF("doc_id", "text", "source")
      val newIds = corpus.collect {
        case (id, _, TextDedup.IncrementalNewSource) => id }.toSet
      val textOf = corpus.map { case (id, t, _) => id -> t }.toMap

      // expected exact: a new doc whose text already exists among the olds
      // (vocab is lowercase alphanumeric, so text IS its normalized form)
      val oldTexts = corpus.collect {
        case (id, t, s) if s != TextDedup.IncrementalNewSource => t }.toSet
      val expectedExact = newIds.filter(id => oldTexts(textOf(id)))

      // expected near: union self-dedup pairs that cross the boundary
      val unionPairs = TextDedup.minhashLsh(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val expectedNear = unionPairs.collect {
        case (a, b) if newIds(a) ^ newIds(b) => if (newIds(a)) a else b
      }.toSet -- expectedExact

      val got = TextDedup.incremental(docs).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = expectedExact.map(_ -> "exact").toMap ++
        expectedNear.map(_ -> "near").toMap
      assert(got === expected,
        s"seed $seed: got $got, expected $expected " +
          s"(extra ${got.keySet -- expected.keySet}, missing ${expected.keySet -- got.keySet})")
    }
  }
}
