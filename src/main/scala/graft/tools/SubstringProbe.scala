package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for [[graft.operators.Dedup.dropDuplicateSubstrings]]:
  * stage plan facts (window mass, duplicated-window mass, covered
  * positions before/after distinct — the operator's one deliberate
  * multiplier) and end-to-end wall for fully materializing the
  * rewritten corpus, across window widths. The rolling-kernel claim
  * (O(len) at any n) is checked directly: the wide window must not
  * cost more than the narrow one on the same corpus.
  *
  * {{{
  * PROBE_DIR=/tmp/sf10z sbt 'runMain graft.tools.SubstringProbe'
  * PROBE_NS=4,8,50 PROBE_DIR2=/tmp/sf100z ...   # optional decade leg
  * }}}
  */
object SubstringProbe {
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

    val ns = sys.env.getOrElse("PROBE_NS", "4,8,50")
      .split(",").map(_.trim.toInt).toSeq
    val dirs = Seq(sys.env.getOrElse("PROBE_DIR", "/tmp/sf10z")) ++
      sys.env.get("PROBE_DIR2")

    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val tokMass = docs
        .select(sum(size(graft.functions.TextFunctions.tokens(col("text")))))
        .head().getLong(0)
      println(s"[substr-probe] dir=$dir docs=$nDocs token_mass=$tokMass")

      ns.foreach { n =>
        // stage facts: window mass, duplicated windows, covered mass
        val wins = docs.select(col("doc_id"), posexplode(
          graft.expressions.WordShingleHashesPos(
            graft.functions.TextFunctions.tokens(col("text")), n))
          .as(Seq("__p", "__h")))
        val dfAgg = wins.groupBy("__h").agg(count(lit(1)).as("df"))
        val f = dfAgg.agg(
          count(lit(1)).as("distinct_windows"),
          sum(col("df")).as("window_mass"),
          sum(when(col("df") >= 2, col("df")).otherwise(0L))
            .as("dup_starts")).head()
        val dupStarts = f.getAs[Long]("dup_starts")
        println(s"[substr-probe] n=$n window_mass=${f.getAs[Long]("window_mass")} " +
          s"distinct=${f.getAs[Long]("distinct_windows")} dup_starts=$dupStarts " +
          s"covered_pre_distinct=${dupStarts * n}")

        val t0 = System.nanoTime()
        val out = Dedup.dropDuplicateSubstrings(docs, "doc_id", "text", n)
        val agg = out.agg(
          count(lit(1)).as("rows"),
          sum(col("n_removed")).as("removed"),
          sum(col("n_tokens")).as("toks"),
          sum(length(col("clean_text")).cast("long")).as("clean_chars"),
          // order-insensitive checksum (mod P keeps the sum in int64):
          // reruns must agree exactly
          sum(graft.functions.HashFunctions.md5Mod(
            concat_ws("|", col("doc_id"), col("clean_text"))))
            .as("checksum")).head()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[substr-probe] n=$n wall=$wall%.1f s rows=${agg.getAs[Long]("rows")} " +
          s"removed=${agg.getAs[Long]("removed")}/${agg.getAs[Long]("toks")} " +
          s"clean_chars=${agg.getAs[Long]("clean_chars")} " +
          s"checksum=${agg.getAs[Long]("checksum")}")
      }
    }
    spark.stop()
  }
}
