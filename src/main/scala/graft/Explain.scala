package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the physical plan of the named queries (or a
  * headline set) so shuffle/broadcast/pushdown/WindowGroupLimit properties
  * can be eyeballed per round. `runMain graft.Explain [query...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("r01_scan_filter", "r04_rollup_5m", "r06_meta_join_5m",
               "r07_topk_union", "r02_latest_n_per_key", "i10_bollinger",
               "r15_mart_join", "s01_cosine_topk")
    for (q <- names) {
      println(s"===================== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
