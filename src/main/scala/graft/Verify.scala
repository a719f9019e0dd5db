package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional args beyond the driver's two = query-name prefixes (iteration aid)
    val prefixes = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val wanted = SparkEntry.queries
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    wanted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Emit every oracle under BOTH the bare query name and the output
    // directory name (`<name>.parquet`) — round 1 lost its whole
    // correctness signal because the driver keys results by directory
    // name while the builder emitted bare names (81× no_oracle).
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-audit of the emitted artifact set (r10 VERDICT #4: the
    // driver's CORRECTNESS artifact arrived EMPTY two rounds running —
    // make any harness/contract mismatch fail LOUDLY here instead of
    // silently zeroing the round). Every registry key must have a
    // non-empty `<name>.parquet` directory with at least one part file,
    // and the oracle json must exist and be non-trivial.
    val missing = wanted.keys.toSeq.sorted.filterNot { n =>
      val d = new java.io.File(s"$outDir/$n.parquet")
      d.isDirectory && Option(d.listFiles())
        .exists(_.exists(f => f.getName.startsWith("part-") && f.length() > 0))
    }
    val oracleBytes = new java.io.File(s"$outDir/oracle_sql.json").length()
    // machine-readable summary on fd 1 (same direct-fd discipline as
    // Bench: sbt's "[info] " prefix would break a strict json parse)
    val fd1 = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    fd1.println(s"""{"verify_outputs":${wanted.size - failed.size},""" +
      s""""expected":${wanted.size},"failed":${failed.size},""" +
      s""""missing_on_disk":${missing.size},"oracle_bytes":$oracleBytes,""" +
      s""""out_dir":"$outDir"}""")
    // rc stays 0 even when incomplete: a partial artifact set still lets
    // the driver compare the queries that DID land (an rc!=0 might make
    // it skip the compare wholesale — the exact empty-artifact failure
    // this audit exists to catch). The INCOMPLETE marker + summary JSON
    // are the loud signal.
    if (missing.nonEmpty || failed.nonEmpty)
      System.err.println(s"[verify] INCOMPLETE: failed=${failed.mkString(",")}" +
        s" missing=${missing.mkString(",")}")
    spark.stop()
  }
}
