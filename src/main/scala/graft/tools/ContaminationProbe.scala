package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level cost attribution for the benchmark-contamination pair
  * (`Dedup.contaminationFractions` / `contaminationFractionsBloom`) —
  * the round-8 sf100 family sweep's one unprobed superlinear entry
  * (~4× for 3.3× rows). Same discipline as [[JaccardProbe]]: each
  * stage timed as its own action, with the plan facts (inventory
  * cardinality, exploded corpus shingles, bloom-admitted count) that
  * decide whether growth is candidate-mass or environment.
  *
  * Per dir it reports:
  *   docs            corpus rows (every-100th-doc split, as the query)
  *   inv_distinct    distinct benchmark shingles (the broadcast /
  *                   sketch size driver)
  *   inv_sec         inventory build wall (explode + distinct + count)
  *   corpus_shingles exploded corpus shingle rows (scan mass)
  *   totals_sec      joinless per-doc totals agg wall
  *   admitted        bloom-admitted corpus shingles (true hits + fpp
  *                   tail — the exchange the sketch could not thin)
  *   admit_sec       wall for the thinned filter count
  *   bcast_sec       full broadcast-variant wall
  *   bloom_sec       full bloom-variant wall
  *
  * A superlinear `inv_distinct` or `admitted` curve convicts the DATA
  * (benchmark inventory growth / hit-rate saturation); flat plan
  * facts with wall swings convict the box. Env: PROBE_RUNS (default
  * 2), SPARK_GRAFT_CPUS. Args: one or more SF dirs.
  */
object ContaminationProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ContaminationProbe <sfDir> [sfDir...]")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.getOrElse("PROBE_RUNS", "2").toInt

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val docs = graft.core.Tables.documents(spark, dir)
      val corpus = docs.where(col("doc_id") % 100 =!= 0)
      val benchmark = docs.where(col("doc_id") % 100 === 0)
      val nDocs = corpus.count()
      (1 to runs).foreach { r =>
        val inventory = benchmark
          .select(explode(Dedup.hashedShingleSet(col("text"), 5)).as("__sh"))
          .distinct()
        val (nInv, invSec) = timed(inventory.count())
        val exploded = corpus.select(col("doc_id"),
          explode(Dedup.hashedShingleSet(col("text"), 5)).as("__sh"))
        val (nSh, totalsSec) = timed(
          exploded.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
            .agg(sum("n_sh")).head().getLong(0))
        // the bloom-thinned exchange mass: rebuild the sketch exactly
        // as the operator does (exact-count auto-sizing)
        val inv2 = inventory.localCheckpoint()
        val items = inv2.count()
        val bloomBytes = inv2
          .agg(graft.expressions.BloomSketch.bloomAgg(
            col("__sh").cast("long"), items))
          .head().getAs[Array[Byte]](0)
        val (nAdm, admitSec) = timed(
          exploded.where(graft.expressions.BloomSketch.mightContain(
            graft.expressions.BloomSketch.bloomLit(bloomBytes),
            col("__sh").cast("long"))).count())
        val (nB, bcastSec) = timed(
          Dedup.contaminationFractions(corpus, benchmark, "doc_id", "text", 5)
            .where(col("n_hit") > 0).count())
        val (nBl, bloomSec) = timed(
          Dedup.contaminationFractionsBloom(corpus, benchmark, "doc_id", "text", 5)
            .where(col("n_hit") > 0).count())
        require(nB == nBl, s"variant outputs diverged: $nB vs $nBl")
        println(f"dir=$dir run=$r docs=$nDocs inv_distinct=$nInv " +
          f"inv_sec=$invSec%.2f corpus_shingles=$nSh totals_sec=$totalsSec%.2f " +
          f"admitted=$nAdm admit_sec=$admitSec%.2f out=$nB " +
          f"bcast_sec=$bcastSec%.2f bloom_sec=$bloomSec%.2f")
      }
    }
    spark.stop()
  }
}
