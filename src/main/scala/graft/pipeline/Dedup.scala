package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (beyond the
  * reference's surface; prompt-mandated first-class components).
  *
  * The synthetic corpus has no natural duplicates, so the dup-producing
  * queries union the corpus with deterministic perturbed clones (every
  * third doc) — the operators then have real work to do and the DuckDB
  * oracle replays the same construction.
  *
  * Scale design: everything is shuffle-on-key relational algebra — exact
  * dedup is one hash aggregate on the content hash; n-gram/MinHash paths
  * build an inverted index (explode → groupBy) whose candidate join touches
  * only co-bucketed pairs, never the full N² cross join. At 100 TB the
  * shingle df-cap bounds the inverted-index fanout (drops stop-shingles),
  * exactly like production LSH dedup pipelines.
  */
object Dedup {
  private type Q = (SparkSession, String) => DataFrame

  /** Corpus ∪ perturbed clones: every 3rd doc reappears with a new id and
    * the last 20 chars replaced — near-dup but not exact-dup.
    */
  private def withClones(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(substring_fn(col("text")),
            lit(" perturbed tail marker")).as("text")))

  private def substring_fn(c: Column): Column =
    substr(c, lit(1), greatest(length(c) - 20, lit(0)))

  private val CLONES_SQL =
    """uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         substr(text, 1, greatest(len(text) - 20, 0)) || ' perturbed tail marker' AS text
      |  FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** Character n-gram set of a text column (1-based positions, identical in
    * DuckDB as `list_transform(generate_series(1, len(t)-n+1), i -> substr(t, i, n))`).
    */
  def charShingles(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), length(c) - (n - 1)),
      i => substr(c, i, lit(n))))

  /** D1 — exact dedup by content hash: canonical id + group size per doc.
    * One window over md5(text); at scale this is the plain
    * hash-partition-by-digest pass.
    */
  private val exact: Q = (s, dir) => {
    val uni = withClones(Tables.documents(s, dir)).filter(length(col("text")) >= 8)
    val w = Window.partitionBy(md5(col("text")))
    uni.select(col("doc_id"),
        min(col("doc_id")).over(w).as("canonical"),
        count(lit(1)).over(w).as("group_size"))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical")).cast("int"))
  }

  /** D2 — n-gram Jaccard near-dup: inverted index on rare 8-gram shingles
    * proposes candidate pairs; exact 3-gram Jaccard confirms. The df ≤ 4
    * cap bounds index fanout (a stop-shingle shared by everything would
    * otherwise quadratically explode the candidate join).
    */
  private val ngramJaccard: Q = (s, dir) => {
    val uni = withClones(Tables.documents(s, dir))
      .filter(length(col("text")) >= 8)
    val sh8 = uni.select(col("doc_id"), explode(charShingles(col("text"), 8)).as("sh"))
    val rare = sh8.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 4)
    val cands = sh8.join(rare, "sh")
      .select(col("doc_id").as("a"), col("sh"))
      .join(sh8.join(rare, "sh").select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val tri = uni.select(col("doc_id"), explode(charShingles(col("text"), 3)).as("g"))
    val triN = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n3"))
    val inter = cands
      .join(tri.select(col("doc_id").as("a"), col("g")), "a")
      .join(tri.select(col("doc_id").as("b"), col("g").as("g2")), "b")
      .filter(col("g") === col("g2"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(triN.select(col("doc_id").as("a"), col("n3").as("na")), "a")
      .join(triN.select(col("doc_id").as("b"), col("n3").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** D3 — MinHash + LSH banding: 32 xxhash64 permutations, 16 bands × 2
    * rows (candidate-miss probability (1−j²)^16 ≈ 0.3% at the corpus's
    * worst-case clone jaccard 0.55); band-equality join proposes pairs,
    * exact 3-gram Jaccard verifies. xxhash64 has no DuckDB twin, so the
    * correctness gate is the ScalaTest spec (all injected clone pairs
    * recovered, no false positives at the 0.5 threshold) rather than a SQL
    * oracle.
    */
  private val minhashLsh: Q = (s, dir) => {
    val uni = withClones(Tables.documents(s, dir))
      .filter(length(col("text")) >= 8)
    val perms = 32
    val sh = uni.select(col("doc_id"),
      explode(charShingles(col("text"), 8)).as("sh"))
    // minhash signature: per perm i, min over shingles of xxhash64(sh, i)
    val hashCols = (0 until perms).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val sig = sh.groupBy(col("doc_id")).agg(hashCols.head, hashCols.tail: _*)
    // 16 bands x 2 rows: band key = hash of the 2 row minima
    val bands = (0 until 16).map { b =>
      sig.select(col("doc_id"), lit(b).as("band"),
        xxhash64((b * 2 until (b + 1) * 2).map(i => col(s"h$i")): _*).as("key"))
    }.reduce(_ unionAll _)
    val cands = bands.alias("x").join(bands.alias("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val tri = uni.select(col("doc_id"), explode(charShingles(col("text"), 3)).as("g"))
    val triN = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n3"))
    cands
      .join(tri.select(col("doc_id").as("a"), col("g")), "a")
      .join(tri.select(col("doc_id").as("b"), col("g").as("g2")), "b")
      .filter(col("g") === col("g2"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(triN.select(col("doc_id").as("a"), col("n3").as("na")), "a")
      .join(triN.select(col("doc_id").as("b"), col("n3").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** D4 — SimHash: 64-bit signature from token xxhash64s, candidate pairs
    * by 8-bit band equality (8 bands — pigeonhole guarantees recall for
    * Hamming ≤ 7, probabilistic above), confirmed at Hamming ≤ 12.
    * ScalaTest-gated like D3 (LSH recall is approximate by design; the
    * spec pins a deterministic floor on this fixed corpus).
    */
  private val simhash: Q = (s, dir) => {
    val uni = withClones(Tables.documents(s, dir))
      .filter(length(col("text")) >= 8)
    val toks = uni.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("h", xxhash64(col("t")))
    // per bit: sum(+1/-1), sign -> bit
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val sigs = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sim = sigs.select(col("doc_id"),
      (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("simhash"))
    val banded = (0 until 8).map { k =>
      sim.select(col("doc_id"), lit(k).as("band"),
        shiftright(col("simhash"), k * 8).bitwiseAND(0xFFL).as("key"))
    }.reduce(_ unionAll _)
    val cands = banded.alias("x").join(banded.alias("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val simA = sim.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val simB = sim.select(col("doc_id").as("b"), col("simhash").as("sb"))
    cands.join(simA, "a").join(simB, "b")
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 12)
      .select(col("a"), col("b"), col("hamming"))
  }

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact" -> exact,
    "d02_dedup_ngram_jaccard" -> ngramJaccard,
    "d03_dedup_minhash_lsh" -> minhashLsh,
    "d04_dedup_simhash" -> simhash)

  val oracle: Map[String, String] = Map(
    "d01_dedup_exact" ->
      s"""WITH $CLONES_SQL
         |SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
         |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
         |  CAST(doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
         |FROM uni WHERE len(text) >= 8""".stripMargin,
    "d02_dedup_ngram_jaccard" ->
      s"""WITH $CLONES_SQL,
         |docs AS (SELECT doc_id, text FROM uni WHERE len(text) >= 8),
         |sh8 AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(text) - 7), i -> substr(text, i, 8)))) AS sh
         |  FROM docs),
         |rare AS (SELECT sh FROM sh8 GROUP BY sh HAVING count(*) BETWEEN 2 AND 4),
         |cands AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM sh8 x JOIN rare USING (sh) JOIN sh8 y USING (sh)
         |  WHERE x.doc_id < y.doc_id),
         |tri AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(text) - 2), i -> substr(text, i, 3)))) AS g
         |  FROM docs),
         |trin AS (SELECT doc_id, count(*) AS n3 FROM tri GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS inter
         |  FROM cands c
         |  JOIN tri ta ON ta.doc_id = c.a
         |  JOIN tri tb ON tb.doc_id = c.b AND tb.g = ta.g
         |  GROUP BY c.a, c.b)
         |SELECT i.a, i.b,
         |  round(CAST(i.inter AS DOUBLE) / (na.n3 + nb.n3 - i.inter), 6) AS jaccard
         |FROM inter i
         |JOIN trin na ON na.doc_id = i.a
         |JOIN trin nb ON nb.doc_id = i.b
         |WHERE CAST(i.inter AS DOUBLE) / (na.n3 + nb.n3 - i.inter) >= 0.6""".stripMargin)
}
