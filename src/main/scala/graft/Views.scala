package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register every graft table as a temp view so ad-hoc
  * `spark.sql` works against the same data the typed operators read — the
  * replacement for the reference's raw-SQL access paths (psql, FastAPI
  * read endpoints, the signal engine's handwritten SQL). The candle and
  * metrics views resolve to the MATERIALIZED (bucketed) tables, so ad-hoc
  * SQL inherits the same zero-exchange per-symbol plans as the operator
  * registry.
  */
object Views {
  /** Raw star-schema + derived fact views. Returns the registered names. */
  def register(spark: SparkSession, dir: String): Seq[String] = {
    val raw = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    raw.foreach(t => Tables.read(spark, dir, t).createOrReplaceTempView(t))
    Tables.candles(spark, dir).createOrReplaceTempView("candles")
    Tables.metrics5m(spark, dir).createOrReplaceTempView("metrics_5m")
    raw ++ Seq("candles", "metrics_5m")
  }
}
