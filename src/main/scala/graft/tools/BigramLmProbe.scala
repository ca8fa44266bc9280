package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Decade + skew probe for [[graft.operators.CorpusStats.bigramLm]] —
  * the round-10 verdict's one unprobed Heaps-table join: the `__w1`
  * context join keys on RAW TOKENS, and Zipf head words concentrate a
  * few percent of all bigram occurrences on single keys. This measures
  * (a) wall at the 500k→5M-doc decade, (b) per-stage task skew
  * (max vs median task duration — the executor-straggler signal a
  * cluster would feel), (c) head-key concentration of the context
  * join, and (d) whether disabling AQE's skew-join handling changes
  * either, i.e. whether AQE is what absorbs the skew.
  *
  * {{{
  * LM_DIR=target/testdata/sf100z sbt 'runMain graft.tools.BigramLmProbe'
  * }}}
  */
object BigramLmProbe {
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

    val dir = sys.env.getOrElse("LM_DIR", "target/testdata/sf10z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    println(s"[lm-probe] dir=$dir docs=${docs.count()}")

    // task-duration listener: per-stage (n, median, max)
    val stageTasks = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stageTasks.synchronized {
          stageTasks.getOrElseUpdate(e.stageId,
            mutable.ArrayBuffer.empty[Long]) += e.taskInfo.duration
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // head-key concentration fact: share of ALL bigram occurrences on
    // the top context keys (the join-skew driver)
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
    val bg = toks.select(
        explode(CorpusStats.bigramPairs(col("__toks"))).as("__p"))
      .select(col("__p.w1").as("__w1"))
    val total = bg.count()
    val top = bg.groupBy("__w1").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("__w1")).limit(10).collect()
    println(f"[lm-probe] bigram occurrences: $total%d; top context keys:")
    top.foreach(r => println(f"[lm-probe]   '${r.getString(0)}' " +
      f"n=${r.getLong(1)}%d (${100.0 * r.getLong(1) / total}%.2f%% of all)"))

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(conv(md5(concat_ws("|", col("doc_id"), col("n_bigrams"),
          col("oov_bigram_frac"), col("lm_score"))).substr(1, 8), 16, 10)
          .cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def run(label: String): (Long, Long) = {
      stageTasks.synchronized(stageTasks.clear())
      val t0 = System.nanoTime()
      val cs = checksum(
        CorpusStats.bigramLm(docs, "doc_id", "text", col("lang") === "en"))
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[lm-probe] $label: wall=$wall%.2f s checksum=$cs")
      val stages = stageTasks.synchronized(stageTasks.toSeq)
      stages.filter(_._2.max >= 1000).sortBy(-_._2.max).take(8)
        .foreach { case (sid, ds) =>
          val s = ds.sorted
          val med = s(s.length / 2)
          println(f"[lm-probe]   stage $sid%4d: tasks=${ds.length}%3d " +
            f"median=${med / 1000.0}%.2fs max=${s.last / 1000.0}%.2fs " +
            f"skew=${s.last.toDouble / math.max(med, 1)}%.1fx")
        }
      cs
    }

    val a = run("AQE skew-join ON (default)")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val b = run("AQE skew-join OFF")
    require(a == b, s"skew-join setting changed the OUTPUT: $a vs $b")
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    val c = run("AQE skew-join ON (repeat)")
    require(a == c, s"repeat run diverged: $a vs $c")
    println("[lm-probe] OK")
    spark.stop()
  }
}
