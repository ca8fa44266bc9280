package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Sizing probe for [[graft.operators.CorpusStats.countMinSketch]]:
  * estimate error vs width at the decade, against the exact counts.
  * The standard bound says overestimate ≤ e·N/width with probability
  * ≥ 1 − e^−depth per query (Cormode & Muthukrishnan '05); this
  * measures where the bound sits on a real Heaps/Zipf vocabulary so a
  * deployment can pick width from its token budget instead of
  * guessing: err_frac·N ≈ the space-accuracy dial.
  *
  * {{{
  * PROBE_DIR=/tmp/sf10z sbt 'runMain graft.tools.CountMinProbe'
  * }}}
  */
object CountMinProbe {
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

    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/sf10z")
    val depth = sys.env.getOrElse("PROBE_DEPTH", "3").toInt
    val widths = sys.env.getOrElse("PROBE_WIDTHS",
      "1024,16384,262144,1048576").split(",").map(_.trim.toInt).toSeq

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val exact = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .persist()
    val totals = exact.agg(sum(col("n_exact")).as("n"),
      count(lit(1)).as("vocab")).head()
    val nTokens = totals.getAs[Long]("n")
    val vocab = totals.getAs[Long]("vocab")
    println(s"[cms-probe] dir=$dir tokens=$nTokens vocab=$vocab depth=$depth")

    widths.foreach { w =>
      val t0 = System.nanoTime()
      val sk = CorpusStats.countMinSketch(docs, "text", depth, w)
      val est = CorpusStats.countMinEstimateWith(exact, "token", sk, depth, w)
      val r = est.agg(
        sum(when(col("n_est") === col("n_exact"), 1L).otherwise(0L))
          .as("exact_hits"),
        max(col("n_est") - col("n_exact")).as("max_abs_err"),
        avg((col("n_est") - col("n_exact")).cast("double")).as("mean_abs_err"),
        sum(when(col("n_est") < col("n_exact"), 1L).otherwise(0L))
          .as("underestimates")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      val bound = math.E * nTokens / w
      println(f"[cms-probe] width=$w%7d rows=${depth.toLong * w}%9d " +
        f"exact=${r.getAs[Long]("exact_hits")}%7d/$vocab " +
        f"max_err=${r.getAs[Long]("max_abs_err")}%9d " +
        f"mean_err=${r.getAs[Double]("mean_abs_err")}%12.2f " +
        f"eN_over_w=$bound%12.1f under=${r.getAs[Long]("underestimates")} " +
        f"wall=$wall%.1f s")
    }
    exact.unpersist()
    spark.stop()
  }
}
