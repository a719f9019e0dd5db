package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: split each query's wall time into
  * (build = DataFrame construction incl. eager memo/checkpoint work,
  * plan = analysis+optimization+physical planning, exec = noop write)
  * so driver-bound entries (fat expression trees, many branches) are
  * distinguishable from execution-bound ones (guide §7.3). min-of-2 per
  * phase set, same session shape as Bench.
  * `runMain graft.Profile <query...>`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.candles(spark, sfDir).count()
    Tables.metrics5m(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    // GRAFT_MEMO=off profiles the honest per-operator cost (the r14 bench
    // accounting); default leaves the serving memos on.
    sys.env.get("GRAFT_MEMO")
      .foreach(v => spark.conf.set("spark.graft.sharedMemo", v))
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    def phases(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      spark.catalog.clearCache()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    // per-job visibility for the second (warm) run: job id, duration,
    // stage task counts — tells tiny-stage latency from real work
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val dt = j.time - starts.getOrDefault(j.jobId, j.time)
        jobs.add(f"job${j.jobId}%4d ${dt / 1000.0}%6.2f s")
      }
    }
    for ((name, fn) <- wanted) {
      val a = phases(name, fn)
      spark.sparkContext.addSparkListener(listener)
      val b = phases(name, fn)
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-28s build=${math.min(a._1, b._1)}%6.2f " +
        f"plan=${math.min(a._2, b._2)}%6.2f exec=${math.min(a._3, b._3)}%6.2f " +
        f"(run1 ${a._1 + a._2 + a._3}%6.2f, run2 ${b._1 + b._2 + b._3}%6.2f)")
      if (sys.env.contains("GRAFT_PROFILE_JOBS")) {
        Thread.sleep(200)
        val it = jobs.iterator()
        while (it.hasNext) println(s"    ${it.next()}")
        jobs.clear()
      }
    }
    spark.stop()
  }
}
