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
}
