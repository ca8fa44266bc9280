package graft.tools

/** Throwaway: explain + single timed run of x_dedup_jaccard at a SF
  * dir, for diagnosing the sf30 disk blowup. Deleted after use.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("x_dedup_jaccard")(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
