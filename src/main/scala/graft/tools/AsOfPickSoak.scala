package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Scale soak for [[graft.operators.AsOfJoin.plan]]/`pick` (round-6
  * item: the data-driven skew selection shipped unit-tested only).
  * On REAL sf1+ events data it asserts that
  *
  *   1. the natural key histogram (15k users, ≤ ~50 rows each at sf1)
  *      chooses [[AsOfJoin.Plain]];
  *   2. after funneling a third of all traffic onto one user — the
  *      hot-key shape the bucketed form exists for — [[AsOfJoin.plan]]
  *      flips to [[AsOfJoin.Bucketed]] with a positive width sized
  *      from the hot key's own span;
  *   3. `pick`'s bucketed output is row-for-row equal (exceptAll both
  *      ways) to the plain single-window form on the same skewed data
  *      — the two forms are semantically interchangeable. The right
  *      side is pre-aggregated to one row per (key, time) first, per
  *      the operator's documented tie contract.
  *
  * Usage: `runMain graft.tools.AsOfPickSoak /tmp/sf1` — prints
  * `[soak] PASS` and exits 0 iff every assertion holds.
  */
object AsOfPickSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("SECOND", col("ts")).as("ts"),
        col("event_type"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))

    def fail(msg: String): Nothing = {
      System.err.println(s"[soak] FAIL: $msg"); sys.exit(1)
    }
    val threshold = 50000L

    // 1. natural histogram: far below threshold -> Plain
    val c0 = AsOfJoin.plan(purchases, views, Seq("user_id"), "ts", "ts",
      hotKeyThreshold = threshold)
    if (c0 != AsOfJoin.Plain) fail(s"expected Plain on natural keys, got $c0")
    println("[soak] ok: natural histogram -> Plain")

    // 2. funnel a third of the users onto key 0: ~130k rows on one key
    def heat(df: org.apache.spark.sql.DataFrame) = df.withColumn("user_id",
      when(col("user_id") % 3 === 0, lit(0L)).otherwise(col("user_id")))
    val pHot = heat(purchases)
    val vHot = heat(views) // re-unique (key, time) after the remap
      .groupBy("user_id", "ts").agg(max(col("view_value")).as("view_value"))
    val c1 = AsOfJoin.plan(pHot, vHot, Seq("user_id"), "ts", "ts", threshold)
    val width = c1 match {
      case AsOfJoin.Bucketed(w) if w >= 1 =>
        println(s"[soak] ok: hot key -> Bucketed(width=$w)"); w
      case other => fail(s"expected Bucketed on the hot key, got $other")
    }

    // 3. bucketed == plain, row for row, on the skewed data
    val picked = AsOfJoin.pick(pHot, vHot, Seq("user_id"), "ts", "ts",
      hotKeyThreshold = threshold)
    val plain = AsOfJoin.asOf(pHot, vHot, Seq("user_id"), "ts", "ts")
    val extra = picked.exceptAll(plain).count()
    val missing = plain.exceptAll(picked).count()
    val n = picked.count()
    if (extra != 0 || missing != 0)
      fail(s"bucketed/plain diverge: +$extra/-$missing of $n rows (width=$width)")
    println(s"[soak] ok: bucketed == plain on $n rows")
    println("[soak] PASS")
    spark.stop()
  }
}
