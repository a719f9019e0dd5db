package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, mirroring a production ANN pipeline:
  *  - [[cosineTopK]]: brute-force exact top-k for a bounded query set —
  *    the correctness baseline. The query side broadcasts; the corpus scan
  *    stays distributed, so this is one pass over N vectors per batch of
  *    queries (never a full N² materialization).
  *  - [[lshAnn]]: sign-random-projection LSH — bucket by the sign pattern
  *    of 8 seeded random hyperplane projections ([[Planes]]), search only
  *    within the bucket. At 100 TB the bucket join replaces the cross
  *    join entirely; recall is tunable by plane count / multi-probe.
  *
  * All dot products fold the vector sequentially in double precision —
  * the DuckDB oracle replays the identical op sequence on
  * `embedding::DOUBLE[]`.
  */
object Similarity {
  private type Q = (SparkSession, String) => DataFrame

  /** Sequential dot product of two pre-cast double arrays — the codegen'd
    * [[graft.functions.ArrayDot]] kernel, bit-equal to the
    * `aggregate(zip_with(...))` fold the DuckDB oracle replays but ~10x
    * cheaper per row (no interpreted closures, no intermediate array).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayFoldCols.arrayDot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Seeded Rademacher hyperplanes for sign-LSH: plane k is a ±1 vector
    * whose signs come from splitmix64(seed=7) — genuinely random
    * directions (round 1 used the signs of 8 fixed coordinates: a toy
    * projection whose recall claims were meaningless), yet fully
    * deterministic and embedded as LITERALS in both the Spark plan and
    * the DuckDB oracle, so there is no RNG at query time and parity is
    * by construction. ±1 coefficients keep the literal compact and the
    * projection a pure add/subtract fold.
    */
  private val Seed = 7L
  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private[pipeline] val Planes: Seq[Seq[Double]] = (0 until 8).map { k =>
    (0 until 64).map { i =>
      if ((splitmix(Seed * 1000003L + k * 64 + i) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** 8-bit sign-LSH bucket of a 64-dim double array: bit k = sign of the
    * projection onto plane k (sequential fold, oracle-parity exact).
    */
  private[graft] def bucketOf(e: Column): Column =
    (0 until 8).map { k =>
      val plane = array(Planes(k).map(lit): _*)
      when(dot(e, plane) >= 0.0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** S1 — exact cosine top-5 neighbors for query vectors vec_id < 10. */
  private val cosineTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("n", norm(col("e")))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("n").as("qn"))
    val pairs = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("e"), col("qe")) /
        nullif(col("n") * col("qn"), lit(0.0)))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** S2 — sign-LSH ANN: 8-bit bucket from the signs of 8 seeded random
    * hyperplane projections; nearest neighbor within bucket (top-1 by
    * cosine).
    */
  private val lshAnn: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("n", norm(col("e")))
    val bucketed = emb.withColumn("bucket", bucketOf(col("e")))
    val a = bucketed.select(col("bucket"), col("vec_id").as("a_id"),
      col("e").as("ae"), col("n").as("an"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("b_id"),
      col("e").as("be"), col("n").as("bn"))
    val pairs = a.join(b, Seq("bucket")).filter(col("a_id") =!= col("b_id"))
      .withColumn("cos", dot(col("ae"), col("be")) /
        nullif(col("an") * col("bn"), lit(0.0)))
    val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("a_id"), col("b_id").as("nn_id"), col("bucket"),
        round(col("cos"), 6).as("cos"))
  }

  /** S3 — embedding-cosine near-duplicate detection: same-bucket pairs with
    * cosine above threshold (the embedding analogue of D2/D3).
    */
  private val cosineNearDup: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("n", norm(col("e")))
    val bucketed = emb.withColumn("bucket", bucketOf(col("e")))
    val a = bucketed.select(col("bucket"), col("vec_id").as("a_id"),
      col("e").as("ae"), col("n").as("an"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("b_id"),
      col("e").as("be"), col("n").as("bn"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("ae"), col("be")) /
        nullif(col("an") * col("bn"), lit(0.0)))
      .filter(col("cos") >= 0.3)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  /** S4 — IVF-style ANN, the other standard scale path next to sign-LSH:
    * a coarse quantizer (centroids = the deterministic vec_id % 53 == 0
    * subset — a seeded sample standing in for trained k-means; ~2% of the
    * corpus) assigns every vector to its nearest cell; queries then search
    * ONLY their own cell (nprobe=1; multi-probe = union over the top-p
    * cells). The build step is one broadcast-centroids × corpus pass —
    * O(N·C) dot products, no N² anywhere — and the probe step touches
    * ~N/C vectors per query. Cell assignment ties break by centroid id via
    * row_number so both engines agree bit-for-bit.
    */
  private val ivfAnn: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("n", norm(col("e")))
    val cent = emb.filter(col("vec_id") % 53 === 0)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("n").as("cn"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id"))
    val assign = emb.join(broadcast(cent))
      .withColumn("ccos", dot(col("e"), col("ce")) /
        nullif(col("n") * col("cn"), lit(0.0)))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("e"), col("n"))
    val q = assign.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("cell"),
        col("e").as("qe"), col("n").as("qn"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assign.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("e"), col("qe")) /
        nullif(col("n") * col("qn"), lit(0.0)))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cell"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "s01_cosine_topk" -> cosineTopK,
    "s02_lsh_ann" -> lshAnn,
    "s03_embedding_near_dup" -> cosineNearDup,
    "s04_ivf_ann" -> ivfAnn)

  private val EMB =
    """emb AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e,
      |         sqrt(list_reduce(list_prepend(0.0,
      |           list_transform(embedding::DOUBLE[], x -> x * x)),
      |           (acc, x) -> acc + x)) AS n
      |  FROM embeddings)""".stripMargin

  private val DOT =
    "list_reduce(list_prepend(0.0, list_transform(list_zip(%s, %s), p -> p[1] * p[2])), (acc, x) -> acc + x)"

  private val BUCKET =
    (0 until 8).map { k =>
      val plane = Planes(k).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      val proj = s"list_reduce(list_prepend(0.0, list_transform(" +
        s"list_zip(e, $plane), p -> p[1] * p[2])), (acc, x) -> acc + x)"
      s"CASE WHEN $proj >= 0.0 THEN ${1 << k} ELSE 0 END"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "s01_cosine_topk" ->
      s"""WITH $EMB,
         |q AS (SELECT vec_id AS q_id, e AS qe, n AS qn FROM emb WHERE vec_id < 10),
         |pairs AS (
         |  SELECT q.q_id, emb.vec_id,
         |         ${DOT.format("emb.e", "q.qe")} / nullif(emb.n * q.qn, 0.0) AS cos
         |  FROM emb JOIN q ON emb.vec_id != q.q_id)
         |SELECT q_id, vec_id AS neighbor_id, round(cos, 6) AS cos, rank FROM (
         |  SELECT q_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM pairs)
         |WHERE rank <= 5""".stripMargin,
    "s02_lsh_ann" ->
      s"""WITH $EMB,
         |bucketed AS (SELECT vec_id, e, n, $BUCKET AS bucket FROM emb),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
         |         ${DOT.format("a.e", "b.e")} / nullif(a.n * b.n, 0.0) AS cos
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
         |SELECT a_id, b_id AS nn_id, bucket, round(cos, 6) AS cos FROM (
         |  SELECT a_id, b_id, bucket, cos,
         |         row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rank
         |  FROM pairs)
         |WHERE rank = 1""".stripMargin,
    "s04_ivf_ann" ->
      s"""WITH $EMB,
         |cent AS (SELECT vec_id AS c_id, e AS ce, n AS cn FROM emb
         |         WHERE vec_id % 53 = 0),
         |assign AS (
         |  SELECT vec_id, c_id AS cell, e, n FROM (
         |    SELECT emb.vec_id, c.c_id, emb.e, emb.n,
         |           row_number() OVER (PARTITION BY emb.vec_id ORDER BY
         |             ${DOT.format("emb.e", "c.ce")} / nullif(emb.n * c.cn, 0.0) DESC,
         |             c.c_id) AS rn
         |    FROM emb CROSS JOIN cent c)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, cell, e AS qe, n AS qn FROM assign
         |      WHERE vec_id < 10),
         |pairs AS (
         |  SELECT q.q_id, a.vec_id, a.cell,
         |         ${DOT.format("a.e", "q.qe")} / nullif(a.n * q.qn, 0.0) AS cos
         |  FROM assign a JOIN q USING (cell)
         |  WHERE a.vec_id != q.q_id)
         |SELECT q_id, vec_id AS neighbor_id, cell, round(cos, 6) AS cos, rank FROM (
         |  SELECT q_id, vec_id, cell, cos,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM pairs)
         |WHERE rank <= 5""".stripMargin,
    "s03_embedding_near_dup" ->
      s"""WITH $EMB,
         |bucketed AS (SELECT vec_id, e, n, $BUCKET AS bucket FROM emb)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       round(${DOT.format("a.e", "b.e")} / nullif(a.n * b.n, 0.0), 6) AS cos
         |FROM bucketed a JOIN bucketed b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${DOT.format("a.e", "b.e")} / nullif(a.n * b.n, 0.0) >= 0.3""".stripMargin)
}
