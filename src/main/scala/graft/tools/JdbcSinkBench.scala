package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{DerbyDialect, JdbcMergeWriter, MergeSpecs}

/** Throughput anchor for the JDBC sink path — the one surface with no
  * perf number through round 8. Measures [[JdbcMergeWriter.upsert]]
  * (MERGE) and [[JdbcMergeWriter.overwriteGroups]] (bridge rewrite)
  * rows/sec against embedded Derby at ~1M rows.
  *
  * Why Derby and not the live Postgres the MERGE SQL is proven on:
  * the container ships Postgres server binaries but no Postgres JDBC
  * driver (zero egress), so `PostgresLiveSpec` necessarily drives the
  * dialect's statement TEXT through psql — a path that cannot carry a
  * DataFrame. Derby is the only JDBC engine reachable from the sink
  * code itself, which makes this a measurement of the WRITER (batch
  * sizing, per-partition transaction, one-pass group streaming), with
  * the store's own ingest speed as a Derby-specific constant. The
  * numbers anchor the writer's overhead shape, not Postgres capacity.
  *
  * Phases, each timed around the full Spark action:
  *   ins   1M fresh keys          — insert-heavy MERGE
  *   upd   same keys, new values  — update-heavy MERGE
  *   noop  same keys, same values — skip-if-identical MERGE (the
  *         write-amplification guard: applied updates should be ~0,
  *         wall time shows what the guard costs when nothing changed)
  *   bridge 1M rows / 100k groups — delete+insert group rewrite
  *
  * Env: SINK_ROWS (default 1,000,000), SINK_PARTITIONS (default 4 —
  * concurrent per-partition transactions into one embedded store;
  * Derby's lock manager serializes table-level escalations, so this
  * measures the writer under mild store-side contention, the realistic
  * shape), SINK_GROUPS (default 100,000).
  *
  * Prints one JSON line with rows/sec per phase.
  */
object JdbcSinkBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SINK_ROWS", "1000000").toLong
    val parts = sys.env.getOrElse("SINK_PARTITIONS", "4").toInt
    val groups = sys.env.getOrElse("SINK_GROUPS", "100000").toLong

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dbDir = java.nio.file.Files.createTempDirectory("graft-sinkbench")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val cf = JdbcMergeWriter.connFactory(url)
    locally {
      val c = cf()
      try {
        val st = c.createStatement()
        st.execute("""CREATE TABLE employees (
          id BIGINT PRIMARY KEY, fullname VARCHAR(200), shortname VARCHAR(50),
          position VARCHAR(100), email VARCHAR(200), phone VARCHAR(50),
          updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)""")
        st.execute("CREATE TABLE task_executors (task_id BIGINT, executor_id BIGINT)")
        // the writer DELETEs per group on first sight — unindexed, that
        // is a 1M-row scan per group; any real bridge table has this
        st.execute("CREATE INDEX te_task ON task_executors (task_id)")
        st.close()
      } finally c.close()
    }

    def employees(tag: String): DataFrame =
      spark.range(rows).repartition(parts).select(
        col("id"),
        concat(lit(s"Employee $tag "), col("id")).as("fullname"),
        concat(lit("emp"), col("id")).as("shortname"),
        lit("worker").as("position"),
        concat(lit("e"), col("id"), lit("@example.com")).as("email"),
        concat(lit("+380"), lpad(col("id") % 1000000000L, 9, "0")).as("phone"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val insSec = timed(JdbcMergeWriter.upsert(
      employees("v1"), MergeSpecs.employees, DerbyDialect, cf))
    val updSec = timed(JdbcMergeWriter.upsert(
      employees("v2"), MergeSpecs.employees, DerbyDialect, cf))
    val noopSec = timed(JdbcMergeWriter.upsert(
      employees("v2"), MergeSpecs.employees, DerbyDialect, cf))

    val bridge = spark.range(rows).repartition(parts).select(
      (col("id") % groups).as("task_id"), col("id").as("executor_id"))
    val bridgeSec = timed(JdbcMergeWriter.overwriteGroups(
      bridge, "task_executors", "task_id",
      Seq("task_id", "executor_id"), DerbyDialect, cf))

    // correctness floor: every phase must have landed every row
    val c = cf()
    val (nEmp, nBridge) = try {
      def one(sql: String): Long = {
        val rs = c.createStatement().executeQuery(sql)
        rs.next(); rs.getLong(1)
      }
      (one("SELECT COUNT(*) FROM employees"),
        one("SELECT COUNT(*) FROM task_executors"))
    } finally c.close()
    require(nEmp == rows, s"employees: $nEmp != $rows")
    require(nBridge == rows, s"bridge: $nBridge != $rows")

    def rps(s: Double): Long = math.round(rows / s)
    println(s"""{"rows":$rows,"partitions":$parts,"groups":$groups,""" +
      s""""insert_sec":$insSec,"insert_rows_per_sec":${rps(insSec)},""" +
      s""""update_sec":$updSec,"update_rows_per_sec":${rps(updSec)},""" +
      s""""noop_sec":$noopSec,"noop_rows_per_sec":${rps(noopSec)},""" +
      s""""bridge_sec":$bridgeSec,"bridge_rows_per_sec":${rps(bridgeSec)},""" +
      s""""batch_size":500,"engine":"derby-embedded"}""")
    spark.stop()
    // Derby shutdown signals success via SQLException — expected
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/db;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    scala.reflect.io.Directory(dbDir.toFile).deleteRecursively(): Unit
  }
}
