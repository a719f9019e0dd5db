package graft

import graft.functions.TextHashCols
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gates for the codegen'd text-signature kernels —
  * the surface whose queries (d03/d04) have no DuckDB oracle, so their
  * correctness otherwise rests on recall pins alone. Each kernel is
  * compared against an INDEPENDENT twin on a seeded random corpus chosen to
  * hit the nasty split semantics (leading/trailing/consecutive spaces,
  * empty text, sub-shingle lengths, multi-byte chars):
  *
  *  - hashed_word_shingles / hashed_shingles / token_lines vs compositions
  *    of Spark's own builtins (`split`/`slice`/`substr`/`xxhash64`) — the
  *    exact formulations the kernel scaladocs claim bit-equality with;
  *  - simhash64 / minhash_sig vs naive driver-side reimplementations from
  *    the published definitions (token-bit majority vote; per-permutation
  *    min of the re-hash), sharing only the XXH64 primitive.
  *
  * A byte-offset bug, an off-by-one in the window walk, or a null-contract
  * drift fails here on hundreds of adversarial strings, not in a recall
  * floor three rounds later.
  */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val Seed = 42L

  /** Seeded corpus: heavy on 'a'/'b'/space so shingles collide and spaces
    * cluster; explicit edge cases prepended; a BMP-unicode tail exercises
    * the kernels' multi-byte fallback path.
    */
  private lazy val corpus: Seq[String] = {
    val rng = new scala.util.Random(12345)
    val edge = Seq("", " ", "  ", "   ", "a", "a ", " a", "a  b", "ab",
      "a b a b", "aaaaaaaaaa", "a a a a a a a a")
    val ascii = Seq.fill(300) {
      val len = rng.nextInt(61)
      String.valueOf(Array.fill(len)("ab  cde".charAt(rng.nextInt(7))))
    }
    val unicode = Seq.fill(30) {
      val len = rng.nextInt(30)
      String.valueOf(Array.fill(len)("αβ 语é ".charAt(rng.nextInt(6))))
    }
    edge ++ ascii ++ unicode
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").cache()
  }

  private def rows(kernel: Column, twin: Column): Array[(Long, Any, Any)] =
    df.select(col("id"), kernel.as("k"), twin.as("t"))
      .collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2)))

  private def assertAgree(kernel: Column, twin: Column, what: String): Unit =
    for ((id, k, t) <- rows(kernel, twin))
      assert(k == t, s"$what diverges on corpus[$id] = '${corpus(id.toInt)}'")

  test("hashed_word_shingles == sorted distinct xxhash64 of builtin-composed shingles") {
    for (n <- Seq(2, 3, 5)) {
      val tk = split(col("text"), " ")
      val twin = when(size(tk) >= n,
        array_sort(array_distinct(transform(
          sequence(lit(1), size(tk) - (n - 1)),
          i => xxhash64(concat_ws(" ", slice(tk, i, lit(n))))))))
      assertAgree(TextHashCols.hashedWordShingles(col("text"), n), twin,
        s"hashed_word_shingles(n=$n)")
    }
  }

  test("hashed_shingles == sorted distinct xxhash64 of substr char n-grams") {
    for (n <- Seq(3, 8)) {
      val twin = when(length(col("text")) >= n,
        array_sort(array_distinct(transform(
          sequence(lit(1), length(col("text")) - (n - 1)),
          i => xxhash64(col("text").substr(i, lit(n)))))))
      assertAgree(TextHashCols.hashedShingles(col("text"), n), twin,
        s"hashed_shingles(n=$n)")
    }
  }

  test("token_lines == builtin-composed n-token line cuts") {
    for (n <- Seq(1, 4)) {
      val tk = split(col("text"), " ")
      val nl = ceil(size(tk).cast("double") / n).cast("int")
      val twin = transform(sequence(lit(0), nl - 1),
        i => concat_ws(" ", slice(tk, i * n + 1, least(lit(n), size(tk) - i * n))))
      assertAgree(TextHashCols.tokenLines(col("text"), n), twin,
        s"token_lines(n=$n)")
    }
  }

  test("char_hist28 == the 27-replace builtin twin + codepoint remainder") {
    val n = length(col("text")).cast("long")
    val alphabet = ('a' to 'z').map(_.toString) :+ " "
    val counts = alphabet.map(ch =>
      (n - length(replace(col("text"), lit(ch), lit("")))).cast("long"))
    val known = counts.reduce(_ + _)
    val twin = array((counts :+ (n - known)): _*)
    assertAgree(TextHashCols.charHist28(col("text")), twin, "char_hist28")
  }

  test("simhash64 == naive token-bit majority vote") {
    val got = df.select(col("id"), TextHashCols.simhash64(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((text, i) <- corpus.zipWithIndex) {
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      val counts = new Array[Int](64)
      for (tok <- toks) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(tok), Seed)
        for (b <- 0 until 64)
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
      }
      val want = (0 until 64).foldLeft(0L) { (acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc
      }
      assert(got(i.toLong) == want, s"simhash64 diverges on corpus[$i] = '$text'")
    }
  }

  test("minhash_sig == naive per-permutation min of the shingle re-hash") {
    val n = 8
    val perms = 32
    val got = df.select(col("id"), TextHashCols.minhashSig(col("text")))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).map(_.toVector)).toMap
    for ((text, i) <- corpus.zipWithIndex) {
      // char windows via UTF-16 substring — equals substringSQL for the
      // BMP-only corpus, and is an independent walk from the kernel's
      // byte-offset one
      val nChars = text.codePointCount(0, text.length)
      val want =
        if (nChars < n) None
        else {
          val mins = Array.fill(perms)(Long.MaxValue)
          for (st <- 0 to nChars - n) {
            val h0 = XXH64.hashUTF8String(
              UTF8String.fromString(text.substring(st, st + n)), Seed)
            val s1 = XXH64.hashLong(h0, Seed)
            for (p <- 0 until perms) {
              val hp = XXH64.hashInt(p, s1)
              if (hp < mins(p)) mins(p) = hp
            }
          }
          Some(mins.toVector)
        }
      assert(got(i.toLong) == want, s"minhash_sig diverges on corpus[$i] = '$text'")
    }
  }

  test("sorted_intersect_count == array_intersect size on signature pairs") {
    val sh = df.select(col("id"),
        TextHashCols.hashedShingles(col("text"), 3).as("ss"))
      .filter(col("ss").isNotNull)
    val a = sh.select(col("id").as("a_id"), col("ss").as("sa"))
    val b = sh.select(col("id").as("b_id"), col("ss").as("sb"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id") + 40)
      .filter(col("a_id") > col("b_id") - 40)
    val diverged = pairs.select(
        TextHashCols.sortedIntersectCount(col("sa"), col("sb")).as("k"),
        size(array_intersect(col("sa"), col("sb"))).as("t"))
      .filter(col("k") =!= col("t")).count()
    assert(diverged == 0L, s"sorted_intersect_count diverges on $diverged pairs")
  }

  test("futures stat kernels == the interpreted HOF spelling bit-for-bit") {
    // pct_stats / abs_dev1_stats / tail_streak_signed replaced the fut
    // mart's transform+fold columns (r8); each must reproduce the HOF
    // spelling's exact IEEE sequence on adversarial arrays (empty, one
    // element, flat runs, zeros, random)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(8)
    val arrays: Seq[Seq[Double]] =
      Seq(Seq.empty[Double], Seq(3.0), Seq(2.0, 2.0), Seq(1.0, 2.0, 2.0, 1.0)) ++
      (1 to 60).map { i =>
        Seq.fill(rnd.nextInt(12) + 1)(
          if (rnd.nextInt(5) == 0) 1.0 else 0.5 + rnd.nextDouble() * 2)
      }
    val df2 = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
    val kern = graft.functions.ArrayFoldCols
    def fmean(arr: Column) = aggregate(arr, lit(0.0), (a, x) => a + x) /
      size(arr).cast("double")
    def pstd(arr: Column, m: Column) = sqrt(
      aggregate(arr, lit(0.0), (a, x) => a + (x - m) * (x - m)) /
        size(arr).cast("double"))
    // twins, the pre-kernel spelling verbatim
    val dps = when(size(col("arr")) >= 2,
      transform(sequence(lit(2), size(col("arr"))), j =>
        (element_at(col("arr"), j) - element_at(col("arr"), j - 1)) /
          element_at(col("arr"), j - 1)))
      .otherwise(array().cast("array<double>"))
    val devs = transform(col("arr"), v => abs(v - 1))
    val dl = when(size(col("arr")) >= 2,
      transform(sequence(lit(2), size(col("arr"))), j =>
        when(element_at(col("arr"), j) === element_at(col("arr"), j - 1), 0)
          .when(element_at(col("arr"), j) > element_at(col("arr"), j - 1), 1)
          .otherwise(-1)))
      .otherwise(array().cast("array<int>"))
    val staged = df2
      .withColumn("dps", dps).withColumn("devs", devs).withColumn("dl", dl)
      .withColumn("m_dps", when(size(col("dps")) > 0, fmean(col("dps"))))
      .withColumn("m_devs", when(size(col("devs")) > 0, fmean(col("devs"))))
    val rev = reverse(col("dl"))
    // `get` instead of the fut builder's original ANSI `element_at`: on an
    // all-zero delta run the filtered array is EMPTY and element_at(_, 1)
    // throws — a latent crash the fixtures never hit (oiv sums never
    // repeat) and that the kernel handles by returning streak 0
    val s0 = get(filter(rev, x => x =!= 0), lit(0))
    val breaks = filter(
      zip_with(rev, sequence(lit(1), greatest(size(rev), lit(1))),
        (x, i) => when(x =!= 0 && x =!= s0, i)), x => x.isNotNull)
    val mag = when(s0.isNull, 0)
      .otherwise(when(size(breaks) > 0, array_min(breaks) - 1)
        .otherwise(size(rev)))
    val diverged = staged.select(
        kern.pctStats(col("arr")).as("ps"),
        kern.absDev1Stats(col("arr")).as("ds"),
        kern.tailStreakSigned(col("arr")).as("st"),
        size(col("dps")).as("t_pn"), col("m_dps").as("t_pm"),
        when(size(col("dps")) >= 2, pstd(col("dps"), col("m_dps"))).as("t_psd"),
        size(col("devs")).as("t_dn"), col("m_devs").as("t_dm"),
        when(size(col("devs")) >= 2, pstd(col("devs"), col("m_devs"))).as("t_dsd"),
        when(size(col("dl")) === 0, lit(null).cast("int"))
          .otherwise(when(s0.isNull, 0)
            .otherwise(when(s0 > 0, mag).otherwise(-mag))).as("t_st"))
      .filter(!(col("ps.n") <=> col("t_pn") && col("ps.m") <=> col("t_pm") &&
        col("ps.sd") <=> col("t_psd") &&
        col("ds.n") <=> col("t_dn") && col("ds.m") <=> col("t_dm") &&
        col("ds.sd") <=> col("t_dsd") && col("st") <=> col("t_st")))
    assert(diverged.count() == 0L,
      s"fut kernels diverge: ${diverged.take(3).mkString("; ")}")
  }

  test("vpvr_poc kernel == the 12-bin filter/aggregate HOF spelling bit-for-bit") {
    // vpvr_poc replaced the vpvr mart's per-row histogram battery (r8).
    // Twin = the pre-kernel spelling verbatim. Adversarial windows: empty,
    // single element, flat price (nullif width NULL branch), exact-tie bin
    // volumes (first-argmax), close at/outside the [plo, phi] edges.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val cases: Seq[(Seq[(Double, Double)], Double)] =
      Seq(
        (Seq.empty, 5.0),
        (Seq((3.0, 7.0)), 3.0),
        (Seq((2.0, 1.0), (2.0, 4.0), (2.0, 2.0)), 2.0),          // flat
        (Seq((0.0, 5.0), (12.0, 5.0), (6.0, 5.0)), 12.0),        // ties, close == phi
        (Seq((0.0, 1.0), (12.0, 1.0)), 0.0),                     // close == plo
        (Seq((1.0, 2.0), (2.0, 3.0)), 9.0),                      // close above phi
        (Seq((1.0, 2.0), (2.0, 3.0)), -4.0)) ++                  // close below plo
      (1 to 80).map { _ =>
        val n = rnd.nextInt(15) + 1
        val win = Seq.fill(n)((
          if (rnd.nextInt(6) == 0) 10.0 else rnd.nextDouble() * 20,
          if (rnd.nextInt(4) == 0) 1.0 else rnd.nextDouble() * 5))
        (win, if (rnd.nextInt(5) == 0) win.last._1 else rnd.nextDouble() * 20)
      }
    val df2 = cases.zipWithIndex.map { case ((w, c), i) => (i.toLong, w, c) }
      .toDF("id", "cfr", "close")
      .withColumn("cf", transform(col("cfr"),
        x => struct(x("_1").as("p"), x("_2").as("v"))))
    // twin: the pre-kernel spelling verbatim
    val plo = array_min(transform(col("cf"), x => x("p")))
    val phi = array_max(transform(col("cf"), x => x("p")))
    val w = nullif(phi - plo, lit(0.0))
    val binOf = (p: Column) => least(floor((p - plo) / w * 12), lit(11.0))
    val bins = transform(sequence(lit(0), lit(11)), b =>
      aggregate(filter(col("cf"), x => binOf(x("p")) === b.cast("double")),
        lit(0.0), (a, x) => a + x("v")))
    val pocBin = array_position(bins, array_max(bins)) - 1
    val pocPrice = plo + (pocBin.cast("double") + lit(0.5)) * (phi - plo) / 12
    val diverged = df2.select(col("id"),
        graft.functions.ArrayFoldCols.vpvrPoc(col("cf"), col("close")).as("k"),
        when(w.isNull, lit(0.0)).otherwise(binOf(col("close"))).as("t_mybin"),
        pocBin.cast("double").as("t_pocb"),
        when(w.isNull, col("close")).otherwise(pocPrice).as("t_poc"))
      .filter(!(col("k.mybin") <=> col("t_mybin") &&
        col("k.pocb") <=> col("t_pocb") && col("k.poc") <=> col("t_poc")))
    assert(diverged.count() == 0L,
      s"vpvr_poc diverges: ${diverged.take(3).mkString("; ")}")
  }

  test("mean_non_null kernel == filter+aggregate HOF spelling bit-for-bit") {
    // mean_non_null replaced the harm mart's valid-RSI mean (r8): same
    // ascending fold over non-null elements, ONE division at the end.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val cases: Seq[Seq[Option[Double]]] =
      Seq(Seq.empty, Seq(None), Seq(None, None), Seq(Some(3.0)),
        Seq(None, Some(2.0), None, Some(-1.5))) ++
      (1 to 60).map { _ =>
        Seq.fill(rnd.nextInt(33))(
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextDouble() * 100 - 20))
      }
    val df2 = cases.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
    val valid = filter(col("arr"), x => x.isNotNull)
    val diverged = df2.select(col("id"),
        graft.functions.ArrayFoldCols.meanNonNull(col("arr")).as("k"),
        size(valid).as("t_n"),
        when(size(valid) > 0, aggregate(valid, lit(0.0), (a, x) => a + x) /
          size(valid).cast("double")).as("t_m"))
      .filter(!(col("k.n") <=> col("t_n") && col("k.m") <=> col("t_m")))
    assert(diverged.count() == 0L,
      s"mean_non_null diverges: ${diverged.take(3).mkString("; ")}")
  }

  test("pq_codes / pq_adc_sum kernels == the aggregate-HOF spellings bit-for-bit") {
    // the r13 optimization moved s06/s11's encode + ADC folds from
    // interpreted `aggregate` HOFs to codegen'd kernels; this pins the
    // kernels to the original spellings on seeded random vectors,
    // including exact-tie codebooks (duplicated sample vectors)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    def vec(): Seq[Double] = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    val cbVecs = {
      val base = Seq.fill(14)(vec())
      base ++ Seq(base.head, base(3)) // exact duplicates → (d, j) ties
    }
    val emb = (0 until 80).map(i => (i.toLong, vec())).toDF("vec_id", "e")
    val cb = cbVecs.zipWithIndex
      .map { case (v, j) => (j, v) }.toDF("j", "ce")
      .agg(array_sort(collect_list(struct(col("j"), col("ce")))).as("cb"))
    def subvec(e: Column, m: Int): Column = slice(e, m * 8 + 1, 8)
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val hofCodes = array((0 until 8).map { m =>
      aggregate(col("cb"),
        struct(lit(Double.MaxValue).as("d"), lit(16).as("j")),
        (acc, c) => {
          val d = sqd(subvec(col("e"), m), subvec(c("ce"), m))
          when(d < acc("d") || (d === acc("d") && c("j") < acc("j")),
            struct(d.as("d"), c("j").as("j"))).otherwise(acc)
        })("j")
    }: _*)
    val coded = emb.crossJoin(cb)
      .select(col("vec_id"), col("e"), col("cb"),
        graft.functions.ArrayFoldCols.pqCodes(col("e"), col("cb")).as("k"),
        hofCodes.as("h"))
    assert(coded.filter(not(col("k") <=> col("h"))).count() == 0L,
      coded.filter(not(col("k") <=> col("h"))).take(2).mkString("; "))
    // ADC: random LUTs, fold order ascending m
    val withLut = coded.withColumn("lut",
      transform(sequence(lit(1), lit(8)), _ =>
        transform(sequence(lit(1), lit(16)),
          j => sin(j.cast("double") * col("vec_id")))))
    val mIdx = array((0 until 8).map(m => lit(m)): _*)
    val hofAdc = aggregate(
      zip_with(col("k"), mIdx, (c, m) => struct(c.as("c"), m.as("m"))),
      lit(0.0),
      (acc, p) => acc +
        element_at(element_at(col("lut"), p("m") + 1), p("c") + 1))
    val adcDiv = withLut.select(
        graft.functions.ArrayFoldCols.pqAdcSum(col("k"), col("lut")).as("k2"),
        hofAdc.as("h2"))
      .filter(not(col("k2") <=> col("h2")))
    assert(adcDiv.count() == 0L, adcDiv.take(2).mkString("; "))
  }

  test("sq_adc_sum kernel == the zip_with/aggregate spelling bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(777)
    val rows = (0 until 60).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextInt(256)),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() - 1),
        Seq.fill(64)(rnd.nextDouble() / 100))
    }.toDF("id", "codes", "qe", "mn", "sc")
    val dIdx = array((0 until 64).map(i => lit(i)): _*)
    val hof = aggregate(
      zip_with(col("codes"), dIdx, (c, i) => struct(c.as("c"), i.as("i"))),
      lit(0.0),
      (acc, p) => {
        val rec = element_at(col("mn"), p("i") + 1) +
          p("c").cast("double") * element_at(col("sc"), p("i") + 1)
        val d = element_at(col("qe"), p("i") + 1) - rec
        acc + d * d
      })
    val div = rows.select(
        graft.functions.ArrayFoldCols.sqAdcSum(col("codes"), col("qe"),
          col("mn"), col("sc")).as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(div.count() == 0L, div.take(2).mkString("; "))
  }

  /** Left-fold dot product twin sharing only IEEE summation order with
    * [[graft.functions.ArrayFolds.dot]] (zip_with + aggregate fold left
    * to right, the same chain the kernel's while loop walks).
    */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("km_argmin kernel == the aggregate-HOF spelling bit-for-bit") {
    // the r14 optimization moved the Lloyd assignment fold (s09/s09b/
    // d09b/c/d/p08 trainer + full-corpus assignment) from an interpreted
    // `aggregate` HOF to the codegen'd km_argmin kernel; this pins the
    // kernel to the original spelling on seeded random vectors including
    // exact-duplicate centroids (d-ties exercising the k tiebreak), a
    // NaN centroid and a -0.0/0.0 pair (SQL double-ordering semantics)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9191)
    def vec(): Seq[Double] = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val centVecs = {
      val base = Seq.fill(6)(vec())
      base ++ Seq(base(1), base(4),                    // exact ties
        Seq.fill(8)(Double.NaN),                        // NaN distance
        Seq(0.0, -0.0, 0.0, -0.0, 0.0, 0.0, 0.0, 0.0)) // signed zeros
    }
    val emb = ((0 until 60).map(_ => vec()) ++
        Seq(centVecs(2), Seq.fill(8)(0.0)))             // exact d=0 hit
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "e")
      .withColumn("en", hofDot(col("e"), col("e")))
    val cents = centVecs.zipWithIndex
      .map { case (c, k) => (k, c, c.foldLeft(0.0)((a, x) => a + x * x)) }
      .toDF("k", "c", "cc")
      .agg(collect_list(struct(col("k"), col("c"), col("cc"))).as("cents"))
    val hof = aggregate(col("cents"),
      struct(lit(Double.MaxValue).as("d"), lit(Int.MaxValue).as("k")),
      (acc, t) => {
        val d = col("en") - lit(2.0) * hofDot(col("e"), t("c")) + t("cc")
        when(d < acc("d") || (d === acc("d") && t("k") < acc("k")),
          struct(d.as("d"), t("k").as("k"))).otherwise(acc)
      })
    val div = emb.crossJoin(cents)
      .select(col("vec_id"),
        graft.functions.ArrayFoldCols.kmArgmin(col("e"), col("en"),
          col("cents")).as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(div.count() == 0L, div.take(3).mkString("; "))
    // end-to-end at the call-site shape: assignedExact (kernel) vs the
    // kept pre-r14 HOF spelling, same broadcast centroid-fold path
    val centArr = centVecs.take(6).toArray // finite-distance centroids
    val ek = graft.pipeline.Similarity.assignedExact(s, emb, centArr)
      .select(col("vec_id"), col("a"))
    val eh = graft.pipeline.Similarity.assignedExactHof(s, emb, centArr)
      .select(col("vec_id"), col("a").as("ah"))
    val ediv = ek.join(eh, Seq("vec_id"))
      .filter(not(col("a") <=> col("ah")))
    assert(ediv.count() == 0L, ediv.take(3).mkString("; "))
  }

  test("cos_argmax kernel == the aggregate-HOF spelling bit-for-bit") {
    // r14 twin of the d09 probed-cosine argmax: candidates include a
    // zero-norm centroid (the nullif-skip path), exact duplicates (cos
    // ties exercising the c_id tiebreak) and the all-skipped degenerate
    // (a zero-norm query row must return the (-2.0, -1) init)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2626)
    def vec(): Seq[Double] = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val candVecs = {
      val base = Seq.fill(6)(vec())
      base ++ Seq(base(0), base(3), Seq.fill(8)(0.0))   // ties + zero norm
    }
    val emb = ((0 until 60).map(_ => vec()) ++
        Seq(candVecs(2), Seq.fill(8)(0.0)))             // cos=1 hit + zero
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "e")
      .withColumn("n", sqrt(hofDot(col("e"), col("e"))))
    val cands = candVecs.zipWithIndex
      .map { case (c, k) =>
        (k.toLong, c, math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))) }
      .toDF("c_id", "ce", "cn")
      .agg(collect_list(struct(col("c_id"), col("ce"), col("cn")))
        .as("cands"))
    val hof = aggregate(col("cands"),
      struct(lit(-2.0).as("ccos"), lit(-1L).as("cell")),
      (acc, t) => {
        val cc = hofDot(col("e"), t("ce")) /
          nullif(col("n") * t("cn"), lit(0.0))
        when(cc > acc("ccos") || (cc === acc("ccos") && t("c_id") < acc("cell")),
          struct(cc.as("ccos"), t("c_id").as("cell"))).otherwise(acc)
      })
    val div = emb.crossJoin(cands)
      .select(col("vec_id"),
        graft.functions.ArrayFoldCols.cosArgmax(col("e"), col("n"),
          col("cands")).as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(div.count() == 0L, div.take(3).mkString("; "))
  }
}
