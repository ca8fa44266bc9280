package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Probe for [[graft.operators.CorpusStats.meanTokenDf]]'s documented
  * broadcast→shuffle handoff: at 100 TB the Heaps-law vocabulary
  * outgrows the broadcast threshold and the planner must fall back to
  * a shuffle join — this forces that fallback
  * (`autoBroadcastJoinThreshold = -1`) on the same corpus and checks
  * (a) the output is IDENTICAL (the integer-exact design's whole
  * point) and (b) what the fallback costs.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.RarityProbe'
  * }}}
  */
object RarityProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[rarity-probe] dir=$dir docs=${docs.count()}")

    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("df_sum"),
        sum(conv(md5(concat_ws("|", col("doc_id"), col("n_distinct_toks"),
          col("df_sum"))).substr(1, 8), 16, 10).cast("long"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def joinNodes(df: DataFrame): Seq[String] = {
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join")).map(_.trim.take(60)).toSeq.distinct
    }
    def run(label: String): (Long, Long, Long) = {
      val t0 = System.nanoTime()
      val out = CorpusStats.meanTokenDf(docs, "doc_id", "text")
      val cs = checksum(out)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rarity-probe] $label: wall=$wall%.2f s checksum=$cs")
      joinNodes(out).foreach(j => println(s"[rarity-probe]   join: $j"))
      cs
    }

    val a = run("broadcast-allowed (default)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val b = run("broadcast-disabled (forced shuffle join)")
    require(a == b, s"vocabulary join strategy changed the OUTPUT: $a vs $b")

    // third leg: is a FORCED vocab broadcast faster than the SMJ the
    // planner picks? (the score join's probe side is the exploded
    // token table — skipping its shuffle is the prize)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val t0 = System.nanoTime()
    val toks = docs.select(col("doc_id").as("__id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
        .as("__tok"))
    val dfs = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val forced = toks.join(broadcast(dfs), "__tok")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_distinct_toks"), sum(col("__df")).as("df_sum"))
    val r = forced.agg(count(lit(1)), sum("df_sum")).head()
    println(f"[rarity-probe] broadcast-forced: wall=${(System.nanoTime() - t0) / 1e9}%.2f s" +
      f" rows=${r.getLong(0)} df_sum=${r.getLong(1)}")
    require(r.getLong(1) == a._2, "forced-broadcast df_sum diverged")
    println("""{"identical":true}""")
    spark.stop()
  }
}
