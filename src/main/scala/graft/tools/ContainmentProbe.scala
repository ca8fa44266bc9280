package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for [[graft.operators.Dedup.containmentPairs]]: plants
  * truncated re-crawls (every 7th doc's first-half tokens, same shape
  * as the `x_dedup_containment` oracle query) into a real corpus, then
  * measures the candidate stage and the end-to-end operator separately
  * and checks two invariants at every decade:
  *
  *  - planted recall is TOTAL — an excerpt's shingle set is a subset
  *    of its source's, so every planted pair must come back at
  *    containment 1.0 (a miss convicts the asymmetric prefix bound);
  *  - nothing below threshold leaks through the verify filter.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.ContainmentProbe'
  * }}}
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val threshold = sys.env.getOrElse("CONT_T", "0.9").toDouble
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val off = 10000000L
    val k = greatest((size(toks) / lit(2)).cast("int"), lit(6))
    val excerpts = d.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        array_join(slice(toks, lit(1), k), " ").as("text"))
    val src = d.unionByName(excerpts)
    val nDocs = src.count()
    val planted = d.where(col("doc_id") % 7 === 0 && size(toks) > 0).count()
    println(s"[cont-probe] dir=$dir docs=$nDocs planted=$planted t=$threshold")

    // candidate stage alone (the part the asymmetric prefix bounds)
    val t0 = System.nanoTime()
    val (cand, sets0) = Dedup.containmentCandidates(src, "doc_id", "text",
      5, threshold, 20000L, 512)
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t0) / 1e9
    sets0.unpersist(blocking = true)
    println(f"[cont-probe] candidates=$nCand%d cand_wall=$tCand%.1fs " +
      f"cand_per_doc=${nCand.toDouble / nDocs}%.2f")

    // end to end (re-runs the candidate stage: this is the query cost)
    val t1 = System.nanoTime()
    val pairs = Dedup.containmentPairs(src, "doc_id", "text",
      threshold = threshold)
    val stats = pairs.agg(
      count(lit(1)).as("pairs"),
      sum(when(col("j") >= off && col("j") - off === col("i"), 1L)
        .otherwise(0L)).as("planted_found"),
      min(col("containment")).as("min_c")).head()
    val tAll = (System.nanoTime() - t1) / 1e9
    val found = stats.getAs[Long]("planted_found")
    println(f"[cont-probe] pairs=${stats.getAs[Long]("pairs")}%d " +
      f"planted_found=$found%d min_c=${stats.getAs[Double]("min_c")}%.4f " +
      f"e2e_wall=$tAll%.1fs")
    require(found == planted,
      s"planted recall violated: $found of $planted")
    require(stats.getAs[Double]("min_c") >= threshold,
      "sub-threshold pair leaked through verify")
    pairs.unpersist(blocking = false)
    println("[cont-probe] OK")
    spark.stop()
  }
}
