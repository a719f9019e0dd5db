package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-latency record against the reference's SLO table
  * (BASELINE.md:15-16 — 1m ingest end-to-end < 5 s, roll-up freshness
  * < 10 s; r12 VERDICT #6): replays the sf 1m candle fact through the
  * REAL streaming path — [[streaming.StreamRollup.csvFileSource]] on a
  * watched directory with the production 3 s trigger — one file per
  * feed tick, and measures per-FILE end-to-end latency: wall-clock from
  * the moment the file lands in the watched directory to the end of the
  * micro-batch that consumed it (trigger queueing + read + plan + sink,
  * everything the SLO covers).
  *
  * Two measured modes:
  *  - `ingest`: file → parse → [[operators.Maintenance.mergeCandles]]
  *    upsert into the running store (the reference's batched ws write,
  *    ws.py:37-38) — the <5 s SLO path;
  *  - `rollup`: file → watermarked 1m→5m streaming aggregate
  *    ([[streaming.StreamRollup.rollup5m]], update mode) — the <10 s
  *    roll-up freshness path (the reference re-materializes caggs on a
  *    1-min schedule; the stream emits the updated 5m rows in the SAME
  *    micro-batch, so this bound is strictly tighter).
  *
  * Batch end times come from each progress event's trigger start
  * timestamp + its `triggerExecution` duration (no listener-thread
  * skew); files map to batches by cumulative input-row counts (the file
  * source never splits a file across micro-batches).
  *
  * Prints one JSON line per mode with p50/p95/max latency seconds.
  */
object StreamBench {
  private final case class Staged(path: java.nio.file.Path, rows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "24").toInt
    val feedMs = sys.env.getOrElse("SPARK_GRAFT_STREAM_FEED_MS", "700").toLong
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.fileSource.log.compactInterval", "100")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the replay: the LAST nFiles distinct minutes of the 1m fact,
    // one CSV file per minute (the backfill.py daily-drop shape at the ws
    // cadence), columns in CandleSchema order (the stream reads the
    // pinned schema positionally)
    val fact = Tables.candles(spark, sfDir).persist()
    val minutes = fact.select(col("bucket_ts")).distinct()
      .orderBy(col("bucket_ts").desc).limit(nFiles)
      .collect().map(_.getLong(0)).sorted
    val stageRoot = java.nio.file.Files.createTempDirectory("graft-stage")
    // the stored fact carries no is_closed (batch bars are closed by
    // construction); the ws schema does — complete missing stream-schema
    // columns with their closed-bar defaults
    val factCols = fact.columns.toSet
    val cols = Tables.CandleSchema.fields.map { f =>
      if (factCols.contains(f.name)) col(f.name)
      else lit(true).cast(f.dataType).as(f.name)
    }.toSeq
    val staged: Seq[Staged] = minutes.zipWithIndex.map { case (m, i) =>
      val d = s"$stageRoot/m$i"
      val slice = fact.filter(col("bucket_ts") === m).select(cols: _*)
      slice.coalesce(1).write.option("header", "true").csv(d)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(d))
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".csv"))
        .findFirst().get()
      Staged(part, slice.count())
    }.toSeq
    fact.unpersist()

    def run(mode: String): String = {
      val watch = java.nio.file.Files.createTempDirectory(s"graft-watch-$mode")
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-ckpt-$mode")
      val src = streaming.StreamRollup.csvFileSource(spark, watch.toString)
      // the running store for the ingest sink (the reference upserts into
      // the candle table; each batch merges against the accumulated store)
      var store = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Tables.CandleSchema)
      store.persist().count()
      val writer = (mode match {
        case "ingest" => src.writeStream.outputMode("append")
          .foreachBatch { (b: DataFrame, _: Long) =>
            val next = operators.Maintenance.mergeCandles(store, b).persist()
            next.count()
            store.unpersist()
            store = next
            ()
          }
        case "rollup" => streaming.StreamRollup.rollup5m(src)
          .writeStream.outputMode("update")
          .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      }).trigger(Trigger.ProcessingTime("3 seconds"))
        .option("checkpointLocation", ckpt.toString)
      val q = writer.start()
      // feeder: one staged file per tick into the watched dir, arrival
      // stamped AFTER the (atomic same-fs) move completes
      val arrivals = staged.zipWithIndex.map { case (f, i) =>
        Thread.sleep(feedMs)
        val dst = watch.resolve(f"f$i%04d.csv")
        java.nio.file.Files.copy(f.path, dst)
        (System.currentTimeMillis(), f.rows)
      }
      q.processAllAvailable()
      val progs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map { p =>
          val end = java.time.Instant.parse(p.timestamp).toEpochMilli +
            p.durationMs.getOrDefault("triggerExecution", 0L)
          (end, p.numInputRows)
        }.sortBy(_._1)
      q.stop()
      store.unpersist()
      // files → batches by cumulative rows (files are never split)
      val latencies = collection.mutable.ArrayBuffer.empty[Double]
      var fi = 0
      var served = 0L
      progs.foreach { case (end, rows) =>
        var inBatch = 0L
        while (fi < arrivals.length && inBatch < rows) {
          latencies += (end - arrivals(fi)._1) / 1000.0
          inBatch += arrivals(fi)._2
          fi += 1
        }
        served += rows
      }
      require(fi == arrivals.length,
        s"$mode: only $fi of ${arrivals.length} files mapped to batches " +
          s"(served $served rows)")
      val s = latencies.sorted
      def pct(q: Double) = s(math.min(s.length - 1, (q * s.length).toInt))
      f"""{"mode":"$mode","files":${s.length},"batches":${progs.length},""" +
        f""""p50_sec":${pct(0.50)}%.2f,"p95_sec":${pct(0.95)}%.2f,""" +
        f""""max_sec":${s.last}%.2f,"trigger_sec":3,"feed_ms":$feedMs}"""
    }

    val lines = Seq(run("ingest"), run("rollup"))
    spark.stop()
    val fd1 = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    lines.foreach(fd1.println)
  }
}
