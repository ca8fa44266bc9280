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
    // 5M-doc legs shuffle a 267M-row token posexplode into the rebuild
    // aggregate; at partitions=cpus (16) that is ~17M rows/partition —
    // sort-spill territory on a local box. SUBSTR_PARTS is the lever a
    // cluster sets by default (AQE coalesces small ones back).
    val parts = sys.env.getOrElse("SUBSTR_PARTS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ns = sys.env.getOrElse("PROBE_NS", "4,8,50")
      .split(",").map(_.trim.toInt).toSeq
    val dirs = Seq(sys.env.getOrElse("PROBE_DIR", "/tmp/sf10z")) ++
      sys.env.get("PROBE_DIR2")
    // PROBE_PLANT=everyK,nPassages,passageTokens: append one of
    // nPassages fixed passages to every K-th doc — REALISTIC
    // duplication (passage reuse at a fixed corpus fraction), unlike
    // iid-Zipf where every n-gram's repeat probability grows with the
    // corpus. With the fraction held constant the duplicated mass is
    // ∝ corpus size, so wall must scale linearly — the anchor.
    val plant = sys.env.get("PROBE_PLANT").map { s =>
      val Array(k, np, len) = s.split(",").map(_.trim.toInt); (k, np, len)
    }

    dirs.foreach { dir =>
      val loaded = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // PROBE_SYNTH=1: replace text with 100 DOC-UNIQUE tokens so the
      // background duplication is exactly zero and the planted
      // passages are the ONLY duplicated mass — the clean anchor
      val raw =
        if (sys.env.get("PROBE_SYNTH").contains("1"))
          loaded.withColumn("text", concat_ws(" ",
            transform(sequence(lit(1), lit(100)),
              i => concat(lit("d"), col("doc_id"), lit("w"), i))))
        else loaded
      val docs = plant.fold(raw) { case (k, np, len) =>
        val passages = array((1 to np).map(p =>
          lit((1 to len).map(i => s"pp${p}t$i").mkString(" "))): _*)
        raw.withColumn("text",
          when(pmod(col("doc_id"), lit(k)) === 0,
            concat_ws(" ", col("text"),
              element_at(passages,
                (pmod(col("doc_id") / k, lit(np)) + 1).cast("int"))))
            .otherwise(col("text")))
      }
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
