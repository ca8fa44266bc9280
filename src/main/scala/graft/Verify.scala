package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Optional third arg: comma-separated query names — dumps (and scopes
  * oracle_sql.json to) just those, so a single query can be gated at an
  * expensive scale point without re-running the whole surface:
  * {{{
  * sbt 'runMain graft.Verify /tmp/sf30 /tmp/v30_chunks x_text_chunks'
  * python3 tools/check_oracle.py /tmp/sf30 /tmp/v30_chunks
  * }}}
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      args.drop(2).headOption.map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    }
    def selected[V](m: Map[String, V]): Map[String, V] =
      only.fold(m)(names => m.filter { case (k, _) => names(k) })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // high-water initial shuffle width, AQE-coalesced to 64 MB
      // targets — see GraftSession for the decade-sweep rationale
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // cached plans coalesce with AQE too (see GraftSession)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // µs int64 timestamps in the dump (not INT96) so the driver's
      // DuckDB/pyarrow compare sees the same logical type it computes.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // LTZ → NTZ on output: session TZ is UTC, so the wall-clock equals
    // the instant; the dump then carries naive µs timestamps, matching
    // what DuckDB computes for the oracle (TIMESTAMPTZ vs TIMESTAMP
    // would never compare equal even for identical instants).
    def naiveTs(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.TimestampType
      val cols = df.schema.fields.map {
        case f if f.dataType == TimestampType =>
          col(f.name).cast("timestamp_ntz").as(f.name)
        case f => col(f.name)
      }
      df.select(cols.toSeq: _*)
    }
    selected(SparkEntry.queries).foreach { case (name, fn) =>
      try naiveTs(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
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
    val json = selected(SparkEntry.oracleSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
