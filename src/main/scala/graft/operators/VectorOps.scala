package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (`ARRAY<FLOAT>`, dim 64):
 * embedding-cosine near-duplicate detection, brute-force cosine top-k as
 * the correctness baseline, and a random-hyperplane-LSH bucketed variant
 * as the scale path (SURVEY.md §7.2-M7).
 *
 * == Determinism across engines ==
 * Floating-point dot products are summation-order-dependent, which would
 * break the DuckDB oracle hash-compare. Instead every vector is quantized
 * to exact integers: `q_i = floor(x_i * 2^20)` — the float→double widening
 * is exact, multiplying by a power of two is exact, floor is exact — and
 * all dot products / squared norms are then BIGINT arithmetic (≤ 2^46 for
 * dim-64 unit-scale vectors, no overflow). The only floating-point ops are
 * one multiply, one sqrt and one divide per pair — each a single
 * correctly-rounded IEEE op, bit-identical in Spark and DuckDB:
 *
 *   sim(a, b) = dot(qa, qb) / sqrt(double(|qa|²) * double(|qb|²))
 *
 * == Scale design ==
 * The brute-force paths broadcast the (tiny) query set and keep the big
 * side partition-local — no shuffle of the corpus. The LSH path buckets
 * the corpus by an 8-bit hyperplane-sign key (a plain shuffle-by-key), so
 * at 100 TB each bucket is ~1/256 of the corpus and the quadratic probe
 * never crosses buckets. Hyperplane components are ±1 derived from md5 at
 * PLAN TIME in Scala and embedded as literals in both the Spark plan and
 * the oracle SQL — no cross-engine RNG to disagree.
 */
object VectorOps {

  /** Quantization scale 2^20 — exact in double for |x| < 2^32. */
  val QuantScale = 1048576.0
  /** Embedding dimensionality of the shared table (TESTDATA.md). */
  val Dim = 64
  /** Cosine threshold for near-duplicate pairs (data tops out ~0.5 —
   * measured at sf0.01; planted near-dups sit above 0.4). */
  val NearDupSim = 0.4
  /** Query subset stride and top-k sizes. */
  val QueryStride = 50
  val BruteK = 5
  val LshK = 3
  /** Number of LSH hyperplanes (bucket key width in bits). */
  val LshPlanes = 8

  // ---- quantization --------------------------------------------------------

  /** `ARRAY<FLOAT>` → exact `ARRAY<BIGINT>`: floor(x * 2^20). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(QuantScale)).cast("long"))

  private def quantizeSql(emb: String): String =
    s"[CAST(floor(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT) for x in $emb]"

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Squared norm of a quantized vector (BIGINT, exact). */
  def norm2(q: Column): Column = dot(q, q)

  /** Exact integer dot product of two quantized vectors — native codegen'd
   * expression ([[graft.plans.LongDot]]); value-identical to
   * `aggregate(zip_with(qa, qb, (x,y) -> x*y), 0L, +)` but ~100× cheaper
   * than the interpreted higher-order path on million-pair joins. */
  def dot(qa: Column, qb: Column): Column =
    toCol(graft.plans.LongDot(toExpr(qa), toExpr(qb)))

  /** Cosine similarity from exact integer parts — 3 IEEE ops, deterministic. */
  def cosine(dotQ: Column, n2a: Column, n2b: Column): Column =
    dotQ.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  private def dotSql(qa: String, qb: String): String =
    s"CAST(list_sum([$qa[i] * $qb[i] for i in range(1, ${Dim + 1})]) AS BIGINT)"

  private def cosineSql(dot: String, n2a: String, n2b: String): String =
    s"(CAST($dot AS DOUBLE) / sqrt(CAST($n2a AS DOUBLE) * CAST($n2b AS DOUBLE)))"

  /** (vec_id, q, n2) projection — the one narrow map-side pass over the
   * corpus that everything else builds on. */
  private def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"), norm2(col("q")).as("n2"))

  private def quantizedSql(table: String): String =
    s"""q0 AS (SELECT vec_id, ${quantizeSql("embedding")} AS q FROM $table),
       |qn AS (SELECT vec_id, q, CAST(list_sum([x * x for x in q]) AS BIGINT) AS n2 FROM q0)""".stripMargin

  // ---- 1. embedding-cosine near-dup ----------------------------------------

  /** All pairs with cosine ≥ [[NearDupSim]] — the exact near-dup baseline.
   * O(n²) compare with a broadcast build side; the LSH variant below is
   * the 100 TB path. Output (id_a, id_b, sim), id_a < id_b. */
  def embeddingNearDup(embeddings: DataFrame): DataFrame = {
    val qn = quantized(embeddings)
    val a = qn.select(col("vec_id").as("id_a"), col("q").as("qa"), col("n2").as("na"))
    val b = qn.select(col("vec_id").as("id_b"), col("q").as("qb"), col("n2").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= NearDupSim)
  }

  def embeddingNearDupSql(table: String): String =
    s"""WITH ${quantizedSql(table)}
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       ${cosineSql(dotSql("a.q", "b.q"), "a.n2", "b.n2")} AS sim
       |FROM qn a JOIN qn b ON a.vec_id < b.vec_id
       |WHERE ${cosineSql(dotSql("a.q", "b.q"), "a.n2", "b.n2")} >= $NearDupSim""".stripMargin

  // ---- 2. brute-force cosine top-k -----------------------------------------

  /** Top-[[BruteK]] cosine neighbors for every stride-[[QueryStride]] query
   * vector, self excluded; ties broken by neighbor id. The query side is
   * tiny by construction → Spark broadcasts it and the corpus never
   * shuffles; ranking shuffles only (query × k) candidate rows. */
  def annBruteTopK(embeddings: DataFrame): DataFrame = {
    val qn = quantized(embeddings)
    val queries = qn.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("nq"))
    val scored = broadcast(queries).join(qn, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(dot(col("qq"), col("q")), col("nq"), col("n2")).as("sim"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= BruteK)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("rank"), col("sim"))
  }

  def annBruteTopKSql(table: String): String =
    s"""WITH ${quantizedSql(table)},
       |queries AS (SELECT vec_id AS query_id, q AS qq, n2 AS nq FROM qn WHERE vec_id % $QueryStride = 0),
       |scored AS (
       |  SELECT query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql(dotSql("qq", "c.q"), "nq", "c.n2")} AS sim
       |  FROM queries JOIN qn c ON query_id <> c.vec_id)
       |SELECT query_id, neighbor_id, rank, sim FROM (
       |  SELECT query_id, neighbor_id, sim,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $BruteK""".stripMargin

  // ---- 3. LSH-bucketed ANN (the scale path) --------------------------------

  /** Deterministic ±1 hyperplanes: component (j, i) is +1 when the first
   * md5 byte of "j:i" is non-negative (high hex nibble 0-7). Computed once
   * at plan time, embedded as literals on both engines. */
  lazy val hyperplanes: Seq[Seq[Int]] = {
    val mdt = MessageDigest.getInstance("MD5")
    (1 to LshPlanes).map { j =>
      (1 to Dim).map { i =>
        val d = mdt.digest(s"$j:$i".getBytes(StandardCharsets.UTF_8))
        if (d(0) >= 0) 1 else -1
      }
    }
  }

  /** 8-char '0'/'1' bucket key: sign bits of the hyperplane dot products
   * (integer-exact on quantized vectors). */
  def lshBucket(q: Column): Column = {
    val bits = hyperplanes.map { h =>
      val hCol = typedLit(h)
      val d = aggregate(zip_with(q, hCol, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      when(d >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  private def lshBucketSql(q: String): String = {
    val bits = hyperplanes.map { h =>
      val lit = h.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum([$q[i] * $lit[i] for i in range(1, ${Dim + 1})]) >= 0 THEN '1' ELSE '0' END)"
    }
    bits.mkString("(", " || ", ")")
  }

  /** Approximate top-[[LshK]]: rank only within the query's hyperplane
   * bucket. The bucket key is the shuffle key — at scale each bucket holds
   * ~1/2^[[LshPlanes]] of the corpus and buckets are probed independently.
   * Output (query_id, neighbor_id, rank, sim). */
  def annLshTopK(embeddings: DataFrame): DataFrame = {
    val qb = quantized(embeddings).withColumn("bucket", lshBucket(col("q")))
    val queries = qb.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("n2").as("nq"), col("bucket"))
    val scored = broadcast(queries)
      .join(qb, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(dot(col("qq"), col("q")), col("nq"), col("n2")).as("sim"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= LshK)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("rank"), col("sim"))
  }

  def annLshTopKSql(table: String): String =
    s"""WITH ${quantizedSql(table)},
       |qb AS (SELECT vec_id, q, n2, ${lshBucketSql("q")} AS bucket FROM qn),
       |queries AS (SELECT vec_id AS query_id, q AS qq, n2 AS nq, bucket FROM qb WHERE vec_id % $QueryStride = 0),
       |scored AS (
       |  SELECT query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql(dotSql("qq", "c.q"), "nq", "c.n2")} AS sim
       |  FROM queries JOIN qb c ON queries.bucket = c.bucket AND query_id <> c.vec_id)
       |SELECT query_id, neighbor_id, rank, sim FROM (
       |  SELECT query_id, neighbor_id, sim,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $LshK""".stripMargin
}
