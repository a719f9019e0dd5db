package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 accounting dial: `spark.graft.sharedMemo=off` must change
  * ONLY whether the seven (session, corpus@stamp)-keyed shared-state memos
  * (k-means trainer, BPE merges, curation manifest, 1h fired corpus, kNN
  * graph, bigram LM, CC labels) are consulted — never a single result row.
  * One representative consumer per cache, both dial positions, row
  * multisets compared exactly. The bench runs memo-off for per-query
  * numbers (r13 verdict #1); this is the proof the dial is pure
  * accounting, not a second semantics.
  */
class MemoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  /** One consumer per memoized shared build. */
  private val consumers = Seq(
    "s09_kmeans",            // trainedCache
    "t16_bpe_merges",        // bpeCache
    "p05_curation_manifest", // manifestCache (+ components, bigram inside)
    "g17_rules_corpus_1h",   // sharedRolledFired
    "g15_rules_volume_1h",   // categoryQueryAt memo-off subset evaluation
    "g05_rules_core",        // categoryQuery memo-off subset evaluation
    "g16_rules_messages",    // sharedFired (whole-corpus consumer)
    "g19_rules_native_cooldown", // sharedNativeFired + sharedNativeCooled
    "g20b_native_feed_retained", // sharedRetainedCooled
    "s07_knn_graph",         // knnGraphCache
    "t20_bigram_lm",         // bigramCache
    "d05_dedup_components")  // sharedComponents

  private def rowsWith(memo: String, q: String): Seq[String] = {
    spark.conf.set("spark.graft.sharedMemo", memo)
    try SparkEntry.queries(q)(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    finally spark.conf.unset("spark.graft.sharedMemo")
  }

  for (q <- consumers)
    test(s"sharedMemo=off is row-identical to memo-on for $q") {
      // memo-on FIRST (populates the cache), memo-off second (must build
      // fresh and match bit-for-bit)
      val on = rowsWith("on", q)
      val off = rowsWith("off", q)
      assert(on == off,
        s"$q diverged under sharedMemo=off (${on.size} vs ${off.size} rows)")
    }
}
