package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kept A/B harness for multi-column distinct-count formulations at a
  * given SF dir — the measurement behind qDistinctAgg's shipped shape
  * (see its scaladoc). `current()` is the per-column two-phase
  * `countDistinct`; `shuffled()` is the explicit repartition(group,
  * col) + post-shuffle dropDuplicates that skips the map-side dedup
  * hash whose state outgrows memory on near-unique columns. Measured
  * (warm, n≥2): sf10 8.4–15.4 → 6.7–8.8 s; sf30 34.4–37.0 → 27.4–28.3
  * s (22.5 s at PROBE_WIDTH=256). Re-run this when touching the
  * distinct path or the AQE partition config; results are asserted
  * equal, wall times printed per run.
  *
  * Env: PROBE_RUNS (default 3), PROBE_WIDTH (0 = AQE-managed width),
  * SPARK_GRAFT_CPUS. Arg: SF dir (default /tmp/sf10).
  */
object DistinctProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, dir)

    def current(): DataFrame = {
      def one(c: String, as: String) =
        li.groupBy("l_linestatus").agg(countDistinct(col(c)).as(as))
      val supp = one("l_suppkey", "n_supp")
      val part = one("l_partkey", "n_part").withColumnRenamed("l_linestatus", "__p")
      val ord = one("l_orderkey", "n_orders").withColumnRenamed("l_linestatus", "__o")
      supp.join(part, col("l_linestatus") <=> col("__p"))
        .join(ord, col("l_linestatus") <=> col("__o"))
        .select(col("l_linestatus"), col("n_supp"), col("n_part"), col("n_orders"))
    }

    val width = sys.env.getOrElse("PROBE_WIDTH", "0").toInt
    def shuffled(): DataFrame = {
      def one(c: String, as: String) = {
        val pairs = li.select(col("l_linestatus"), col(c))
        (if (width > 0) pairs.repartition(width, col("l_linestatus"), col(c))
         else pairs.repartition(col("l_linestatus"), col(c)))
          .dropDuplicates("l_linestatus", c)
          .groupBy("l_linestatus").agg(count(lit(1)).as(as))
      }
      val supp = one("l_suppkey", "n_supp")
      val part = one("l_partkey", "n_part").withColumnRenamed("l_linestatus", "__p")
      val ord = one("l_orderkey", "n_orders").withColumnRenamed("l_linestatus", "__o")
      supp.join(part, col("l_linestatus") <=> col("__p"))
        .join(ord, col("l_linestatus") <=> col("__o"))
        .select(col("l_linestatus"), col("n_supp"), col("n_part"), col("n_orders"))
    }

    def time(name: String, f: () => DataFrame): Array[org.apache.spark.sql.Row] = {
      val t0 = System.nanoTime()
      val rows = f().orderBy("l_linestatus").collect()
      println(f"[probe] $name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      rows
    }
    // warm the scan cache once so neither variant pays first-read I/O
    li.select("l_linestatus", "l_suppkey", "l_partkey", "l_orderkey")
      .write.format("noop").mode("overwrite").save()
    (1 to sys.env.getOrElse("PROBE_RUNS", "3").toInt).foreach { i =>
      val a = time(s"current#$i", current)
      val b = time(s"shuffled#$i", shuffled)
      assert(a.sameElements(b), "variants disagree")
    }
    spark.stop()
  }
}
