package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Adversarial-sliver anchor for
  * [[graft.operators.CorpusStats.heavyHittersOverStream]] — the
  * plant-the-adversary method that convicted the round-14 window
  * thinning, aimed at the one unmeasured assumption in the
  * whole-stream heavy-hitter plan: every gate so far ran with a TINY
  * candidate sliver (threshold = 1/64 of token mass), where the
  * candidate list broadcasts and the scaladoc's "history is scanned
  * but never shuffled" holds. An operator given an adversarially LOW
  * threshold produces MILLIONS of candidates — the broadcast is
  * impossible, and the question is whether the LeftSemi path AQE-plans
  * into an ordinary shuffled join that completes, or concentrates /
  * OOMs the way the window thinning did.
  *
  * The planted adversary: a history of `N_DOCS` documents, each with
  * 10 UNIQUE rare tokens appearing exactly TWICE (vocabulary = 10 ×
  * N_DOCS tokens, every one of them at exactly df 2), plus 5 hot
  * tokens. At threshold = 2 every history token is heavy-from-history
  * (histHeavy = the full vocabulary), so the candidate set IS the
  * Heaps-law vocabulary — the worst case the operator admits. The
  * probe runs the sliver point (high threshold, broadcast expected)
  * and the adversarial point (threshold 2), asserts EXACTNESS against
  * the plain recompute at both, and reports the final AQE-chosen join
  * strategies and wall times.
  *
  * {{{
  * N_DOCS=2000000 sbt 'runMain graft.tools.HeavySliverProbe'
  * }}}
  */
object HeavySliverProbe {

  private def joinStrategies(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(s => s -> plan.linesIterator.count(l => l.contains(s) &&
        l.contains("LeftSemi")))
      .collect { case (s, n) if n > 0 => s"$s x$n" }
      .mkString(", ")
  }

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

    val nDocs = sys.env.getOrElse("N_DOCS", "2000000").toLong
    val (depth, width) = (3, 4096)

    // history: 10 unique rare tokens per doc, each written twice (so
    // every rare token sits at EXACTLY df 2 - the adversarial
    // threshold's edge), plus hot tokens on 1/8 of docs
    def mkDocs(ids: org.apache.spark.sql.Dataset[java.lang.Long],
        prefix: String): DataFrame = {
      val rares = (0 until 10).map(i =>
        concat(lit(prefix), (col("id") * 10 + i).cast("string")))
      ids.select(col("id").as("doc_id"),
        concat_ws(" ",
          (rares ++ rares ++ Seq(
            when(col("id") % 8 === 7,
              concat(lit("hot"), (col("id") % 5).cast("string")))
              .otherwise(lit("")))): _*).as("text"))
    }
    val hist = mkDocs(spark.range(0, nDocs), "r")
    val today = mkDocs(spark.range(0, nDocs / 10), "b")

    var t0 = System.nanoTime()
    val history = CorpusStats.tokenCounts(hist, "text")
      .localCheckpoint(true)
    val sketch = CorpusStats.countMinSketch(hist, "text", depth, width)
      .localCheckpoint(true)
    val vocab = history.count()
    println(f"[heavy-sliver] docs=$nDocs%,d vocab=$vocab%,d " +
      f"build=${(System.nanoTime() - t0) / 1e9}%.1f s")

    def runPoint(name: String, threshold: Long): Unit = {
      t0 = System.nanoTime()
      val out = CorpusStats.heavyHittersOverStream(today, "text",
        history, sketch, depth, width, threshold)
        .agg(count(lit(1)), coalesce(sum(col("n")), lit(0L)))
      val got = out.collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      // read the FINAL adaptive plan of the df that actually executed,
      // so the reported strategy is what AQE chose at runtime
      val strategies = joinStrategies(out)
      t0 = System.nanoTime()
      val want = CorpusStats.tokenCounts(
          hist.unionByName(today), "text")
        .where(col("n") >= threshold)
        .agg(count(lit(1)), coalesce(sum(col("n")), lit(0L)))
        .collect()(0)
      val recomputeWall = (System.nanoTime() - t0) / 1e9
      require(got == want,
        s"$name: drifted from recompute (got $got want $want)")
      println(f"[heavy-sliver] $name threshold=$threshold%,d: " +
        f"rows=${got.getLong(0)}%,d mass=${got.getLong(1)}%,d " +
        f"wall=$wall%.1f s (recompute $recomputeWall%.1f s) " +
        f"semi-joins: $strategies .. EXACT")
    }

    // sliver point: the shape every existing gate runs (few heavy
    // tokens, candidate list broadcasts)
    runPoint("sliver", nDocs / 8 / 5 / 2)
    // adversarial point: EVERY history token is a candidate - the
    // full Heaps vocabulary flows through the semi joins
    runPoint("adversarial", 2L)

    println("[heavy-sliver] ALL PASS")
    spark.stop()
  }
}
