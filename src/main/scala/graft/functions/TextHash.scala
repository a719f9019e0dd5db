package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Row-local text-signature kernels for the dedup pipeline
  * (SimHash / MinHash / hashed shingles).
  *
  * Round-1 bench postmortem: d04 computed its 64 SimHash bit counters as 64
  * separate SQL `sum` aggregates over an exploded token table (and d03 its
  * 32 MinHash minima as 32 `min` aggregates over exploded shingles). That
  * shape is scale-safe but pays an explode + shuffle for what is a pure
  * per-row function of the text, and 60+ aggregate columns fall out of
  * whole-stage codegen. These expressions compute the identical values in
  * one codegen'd pass over the string: no explode, no shuffle, and the
  * signature scan keeps parquet pushdown on the document table.
  *
  * Value parity with the SQL formulation is exact: token/shingle hashes use
  * the same XXH64 routines (`xxhash64(s)` = [[XXH64.hashUTF8String]] at
  * seed 42; `xxhash64(h, i)` = hashInt(i, hashLong(h, 42))), so the outputs
  * are bit-equal to round 1's and the PipelineSpec recall pins hold.
  */
object TextHash {
  private final val SEED = 42L

  /** SimHash64 of the single-space-separated tokens of `s`: bit b is set
    * when more tokens have bit b of their xxhash64 set than not (ties →
    * unset, matching `sum(±1) > 0`). Byte-level split on 0x20 — identical
    * to regex split on " " for UTF-8 (no multi-byte sequence contains
    * 0x20), empty tokens skipped. Returns null boxed as Long.MinValue
    * sentinel-free: caller filters docs with no tokens via [[hasTokens]].
    */
  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          val h = XXH64.hashUnsafeBytes(bytes,
            Platform.BYTE_ARRAY_OFFSET + start, i - start, SEED)
          var b = 0
          while (b < 64) {
            counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** The t12 character histogram in ONE byte pass: counts of 'a'..'z' and
    * ' ' (buckets 0–26, in that order), bucket 27 = every other CODEPOINT
    * (numChars − Σ known). Value-equal to the 27 `length(replace(text,
    * ch, ''))` count columns the first t12 shipped — ASCII bytes never
    * occur inside UTF-8 multi-byte sequences, so byte counting equals
    * per-character counting for the ASCII alphabet, and the "other"
    * bucket counts codepoints exactly like `length()` does — but one scan
    * instead of 27 string rewrites (2.6 → ~0.6 s at sf0.1).
    */
  def charHist28(s: UTF8String): ArrayData = {
    val counts = new Array[Long](28)
    val bytes = s.getBytes
    var known = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') { counts(b - 'a') += 1L; known += 1L }
      else if (b == ' ') { counts(26) += 1L; known += 1L }
      i += 1
    }
    counts(27) = s.numChars().toLong - known
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  def hasTokens(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != ' ') return true
      i += 1
    }
    false
  }

  /** Hash of the `n`-char shingle starting at byte `off` (ASCII fast path)
    * — equal to `xxhash64(substr(text, pos, n))`.
    */
  private def hashAt(bytes: Array[Byte], off: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, SEED)

  /** MinHash signature: for perm i, min over the text's char `n`-gram
    * shingles of `xxhash64(xxhash64(shingle), i)` (the re-hash
    * "independent permutation" trick; duplicates can't change a min, so no
    * distinct pass is needed). Null when the text has no shingle.
    */
  def minhashSig(s: UTF8String, n: Int, perms: Int): ArrayData = {
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    foreachShingleHash(s, n) { h0 =>
      any = true
      val s1 = XXH64.hashLong(h0, SEED)
      var i = 0
      while (i < perms) {
        val hi = XXH64.hashInt(i, s1)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
    }
    if (!any) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** xxhash64 of each distinct char `n`-gram of `s`, SORTED ascending —
    * same multiset as `transform(array_distinct(shingles), g ->
    * xxhash64(g))` (distinctness taken on the 64-bit hash; a cross-string
    * collision would diverge, ~2⁻⁶⁴ per pair). Sorted so that pairwise
    * set intersection is an allocation-free merge walk
    * ([[sortedIntersectCount]]) instead of `array_intersect`'s per-call
    * hash set — set measures (sizes, intersections) are order-blind, so
    * downstream results are unchanged. Null when no shingle.
    */
  def hashedShingles(s: UTF8String, n: Int): ArrayData = {
    val seen = new java.util.HashSet[java.lang.Long]()
    foreachShingleHash(s, n)(h => seen.add(h))
    if (seen.isEmpty) return null
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** xxhash64 of each distinct `n`-TOKEN shingle (tokens = split on the
    * single space, SQL `split(text, " ")` semantics including empty tokens
    * from consecutive spaces), SORTED ascending. The shingle string
    * `concat_ws(" ", slice(tk, i, n))` is exactly the byte window from
    * token i's start to token i+n-1's end, so each hash is one zero-copy
    * window hash — equal to `xxhash64` of the reconstructed string, no
    * string is ever built. Null when the text has fewer than n tokens.
    */
  def hashedWordShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets: 0 and every position after a space
    var t = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') t += 1; i += 1 }
    if (t < n) return null
    val starts = new Array[Int](t + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(t) = len + 1 // sentinel: "start" just past a virtual trailing space
    val seen = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i <= t - n) {
      val from = starts(i)
      val until = starts(i + n) - 1 // end of token i+n-1
      seen.add(hashAt(bytes, from, until - from))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Cut the text into consecutive `n`-token lines (tokens = split on the
    * single space, empty tokens included — SQL `split` semantics): line i
    * is `concat_ws(" ", slice(tk, i*n+1, n))`, produced as zero-copy byte
    * windows in one pass. The last line keeps the remainder tokens. Empty
    * text yields one empty line (split("") = [""]) — never null, so
    * callers must length-filter empty docs themselves if they care.
    */
  def tokenLines(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var t = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') t += 1; i += 1 }
    val starts = new Array[Int](t + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(t) = len + 1 // sentinel: start just past a virtual trailing space
    val nLines = (t + n - 1) / n
    val out = new Array[AnyRef](nLines)
    i = 0
    while (i < nLines) {
      val from = starts(i * n)
      val until = starts(math.min(i * n + n, t)) - 1
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** |A ∩ B| for two ascending-sorted long arrays: one merge walk, no
    * allocation — safe to re-evaluate inside a join condition, where
    * Catalyst offers no subexpression elimination and `array_intersect`
    * would rebuild its hash set on every evaluation.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Iterate xxhash64 of every char n-gram (positions 1..numChars-n+1,
    * SQL `substr` semantics). ASCII texts take a zero-copy byte window;
    * texts with multi-byte chars fall back to per-position substringSQL.
    */
  private def foreachShingleHash(s: UTF8String, n: Int)(f: Long => Unit): Unit = {
    val bytes = s.getBytes
    if (bytes.length == s.numChars()) {
      var i = 0
      val last = bytes.length - n
      while (i <= last) { f(hashAt(bytes, i, n)); i += 1 }
    } else {
      var i = 1
      val last = s.numChars() - n + 1
      while (i <= last) {
        f(XXH64.hashUTF8String(s.substringSQL(i, n), SEED))
        i += 1
      }
    }
  }
}

/** `char_hist28(text)` — the t12 fixed-alphabet character histogram. */
case class CharHist28(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_hist28"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.charHist28(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.charHist28($c)")
  override protected def withNewChildInternal(newChild: Expression): CharHist28 =
    copy(child = newChild)
}

/** `simhash64(text)` — 64-bit SimHash of the space-separated tokens. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `minhash_sig(text)` — array of the 32 MinHash permutation minima over
  * 8-char shingles; null for texts with no shingle.
  */
case class MinHashSig(child: Expression, n: Int = 8, perms: Int = 32)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(input.asInstanceOf[UTF8String], n, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TextHash.minhashSig($c, $n, $perms);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    code
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `hashed_shingles(text, n)` — xxhash64 of each distinct char n-gram,
  * first-occurrence order; null for texts shorter than n chars.
  */
case class HashedShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TextHash.hashedShingles($c, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** `hashed_word_shingles(text, n)` — xxhash64 of each distinct n-token
  * shingle, sorted; null for texts with fewer than n tokens.
  */
case class HashedWordShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedWordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TextHash.hashedWordShingles($c, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
    copy(child = newChild)
}

/** `token_lines(text, n)` — the text cut into n-token lines. */
case class TokenLines(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_lines"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenLines(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenLines($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenLines =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)` — |A ∩ B| of two sorted long arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-side entry points. */
object TextHashCols {
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  def minhashSig(c: Column): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c)))
  def hashedShingles(c: Column, n: Int): Column =
    GraftBridge.column(HashedShingles(GraftBridge.expression(c), n))
  def hashedWordShingles(c: Column, n: Int): Column =
    GraftBridge.column(HashedWordShingles(GraftBridge.expression(c), n))
  def tokenLines(c: Column, n: Int): Column =
    GraftBridge.column(TokenLines(GraftBridge.expression(c), n))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def charHist28(c: Column): Column =
    GraftBridge.column(CharHist28(GraftBridge.expression(c)))
}
