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
    for ((name, fn) <- wanted) {
      val a = phases(name, fn)
      val b = phases(name, fn)
      println(f"$name%-28s build=${math.min(a._1, b._1)}%6.2f " +
        f"plan=${math.min(a._2, b._2)}%6.2f exec=${math.min(a._3, b._3)}%6.2f " +
        f"(run1 ${a._1 + a._2 + a._3}%6.2f, run2 ${b._1 + b._2 + b._3}%6.2f)")
    }
    spark.stop()
  }
}
