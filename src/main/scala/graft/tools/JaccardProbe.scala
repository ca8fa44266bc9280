package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level cost attribution for the prefix-filtered n-gram Jaccard
  * dedup (`Dedup.ngramJaccardPairs`) — the tool behind the round-8
  * heavy-tail adjudication (SCALING.md): is the observed sf30 wall
  * time candidate-pair growth (a plan defect the Bayardo positional/
  * length filters would fix) or environment (GC / host contention)?
  *
  * Per run it reports, each as its own timed action:
  *   docs        corpus rows
  *   set_build   persist+count of the hashed shingle sets (scan+kernel)
  *   cand_count  candidate pairs out of the prefix-filtered index join
  *   cand_sec    wall for the candidate stage (index + join + distinct)
  *   verify_sec  wall for the exact-Jaccard confirm on the candidates
  *   out         surviving pairs
  *
  * Candidate counts are plan facts (deterministic for a dataset), so
  * a superlinear cand_count curve across sf points convicts the plan;
  * flat-ish cand growth with wall-time swings convicts the box.
  *
  * Env: PROBE_RUNS (default 2), SPARK_GRAFT_CPUS. Args: one or more
  * SF dirs, e.g. `runMain graft.tools.JaccardProbe /tmp/sf10 /tmp/sf30`.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JaccardProbe <sfDir> [sfDir...]")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.getOrElse("PROBE_RUNS", "2").toInt

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // PROBE_DF_HIST=1: print the shingle document-frequency histogram
    // (log2 buckets) and the Σ df² candidate mass per bucket — shows
    // which df band drives the candidate count and whether the hot
    // cut (√n) sits in the right place for this corpus.
    if (sys.env.get("PROBE_DF_HIST").contains("1")) args.foreach { dir =>
      val docs = graft.core.Tables.documents(spark, dir)
      val hist = docs.select(
          explode(graft.operators.Dedup.hashedShingleSet(col("text"), 5))
            .as("__h"))
        .groupBy("__h").agg(count(lit(1)).as("df"))
        .groupBy(floor(log2(col("df"))).as("log2df"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(col("df").cast("double") * (col("df") - 1) / 2).as("pair_mass"))
        .orderBy("log2df")
        .collect()
      println(s"df-histogram dir=$dir (log2(df) -> shingles, Σ df·(df-1)/2)")
      hist.foreach(r => println(
        f"  2^${r.getLong(0)}%2d  ${r.getLong(1)}%12d  ${r.getDouble(2)}%18.0f"))
    }

    args.foreach { dir =>
      (1 to runs).foreach { r =>
        val docs = graft.core.Tables.documents(spark, dir)
        val nDocs = docs.count()
        // the builder itself runs eager jobs (docs.count + hot-shingle
        // df aggregate + collect) — time it separately
        val ((cand, sets), buildSec) = timed(
          graft.operators.Dedup.ngramJaccardCandidates(
            docs, "doc_id", "text", 5, 0.7, 20000L, 512))
        val (_, setSec) = timed(sets.count())
        val (nCand, candSec) = timed(cand.count())
        val ((nOut, outSec)) = timed(
          graft.operators.Dedup.jaccardVerify(cand, sets, 0.7).count())
        sets.unpersist(blocking = true)
        println(f"dir=$dir run=$r docs=$nDocs build_sec=$buildSec%.2fs " +
          f"set_build=$setSec%.2fs cand=$nCand cand_sec=$candSec%.2fs " +
          f"verify_sec=$outSec%.2fs out=$nOut")
      }
    }
    spark.stop()
  }
}
