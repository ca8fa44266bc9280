package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kept A/B harness for aggregate-shape decisions on near-unique keys:
  * two-phase (map-side partial agg) versus repartition-by-key-first
  * with all dedup/agg state post-shuffle. The measurements behind the
  * shipped shapes of qDistinctAgg and a4DedupByPk (see their
  * scaladocs). Re-run when touching the distinct/dedup paths or the
  * AQE partition config; variant results are asserted equal, wall
  * times printed per run.
  *
  * `distinct` mode — qDistinctAgg's three per-column passes:
  * `current()` is per-column two-phase `countDistinct`; `shuffled()`
  * repartitions by the (group, value) pair and dedups post-shuffle.
  * Measured (warm, n≥2): sf10 8.4–15.4 → 6.7–8.8 s; sf30 34.4–37.0 →
  * 27.4–28.3 s (22.5 s at PROBE_WIDTH=256; shipped form leaves width
  * to AQE).
  *
  * `dedup` mode — a4's groupBy-min over a near-unique PK, and k5's
  * collect_set per PK as the control. Measured (warm): a4 sf10
  * 8.0–13.0 → 6.6–7.7 s, sf30 24–32 → 20 s — repartition-first wins;
  * k5 sf10 3.2–3.7 → 4.4–4.5 s — repartition-first LOSES, because
  * collect_set's partial agg genuinely reduces (~4 rows → 1 array).
  * The rewrite pays only where map-side aggregation yields no
  * reduction; k5 ships two-phase.
  *
  * Env: PROBE_RUNS (default 3), PROBE_WIDTH (0 = AQE-managed width),
  * SPARK_GRAFT_CPUS. Args: SF dir (default /tmp/sf10), then mode
  * `distinct` | `dedup` | `all` (default distinct).
  */
object DistinctProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val mode = args.drop(1).headOption.getOrElse("distinct")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, dir)

    def distinctCurrent(): DataFrame = {
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
    def distinctShuffled(): DataFrame = {
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

    def a4Base(): DataFrame =
      li.unionByName(li.where(col("l_orderkey") % 2 === 0))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    def a4Finish(pk: DataFrame): DataFrame =
      pk.groupBy("l_orderkey", "l_linenumber")
        .agg(min(col("l_returnflag")).as("l_returnflag"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    def a4Current(): DataFrame = a4Finish(a4Base())
    def a4Shuffled(): DataFrame =
      a4Finish(a4Base().repartition(col("l_orderkey"), col("l_linenumber")))

    def k5Finish(pairs: DataFrame): DataFrame =
      pairs.groupBy(col("l_orderkey").as("task_id"))
        .agg(array_sort(collect_set(col("l_suppkey"))).as("executors"))
        .select(size(col("executors")).as("n_exec"))
        .groupBy("n_exec").agg(count(lit(1)).as("n"))
    def k5Current(): DataFrame =
      k5Finish(li.select(col("l_orderkey"), col("l_suppkey")))
    def k5Shuffled(): DataFrame =
      k5Finish(li.select(col("l_orderkey"), col("l_suppkey"))
        .repartition(col("l_orderkey")))

    def time(name: String, f: () => DataFrame, sort: String): Array[org.apache.spark.sql.Row] = {
      val t0 = System.nanoTime()
      val rows = f().orderBy(sort).collect()
      println(f"[probe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      rows
    }
    // warm the scan cache once so no variant pays first-read I/O
    li.select("l_linestatus", "l_suppkey", "l_partkey", "l_orderkey",
        "l_linenumber", "l_returnflag")
      .write.format("noop").mode("overwrite").save()
    (1 to sys.env.getOrElse("PROBE_RUNS", "3").toInt).foreach { i =>
      if (mode == "distinct" || mode == "all") {
        val a = time(s"distinct-current#$i", distinctCurrent, "l_linestatus")
        val b = time(s"distinct-shuffled#$i", distinctShuffled, "l_linestatus")
        assert(a.sameElements(b), "distinct variants disagree")
      }
      if (mode == "dedup" || mode == "all") {
        val a = time(s"a4-current#$i", a4Current, "l_returnflag")
        val b = time(s"a4-shuffled#$i", a4Shuffled, "l_returnflag")
        assert(a.sameElements(b), "a4 variants disagree")
        val c = time(s"k5-current#$i", k5Current, "n_exec")
        val d = time(s"k5-shuffled#$i", k5Shuffled, "n_exec")
        assert(c.sameElements(d), "k5 variants disagree")
      }
    }
    spark.stop()
  }
}
