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
  * Env: PROBE_RUNS (default 2), SPARK_GRAFT_CPUS, PROBE_FLOOR /
  * PROBE_HOTCAP (index-path forcing, see below), PROBE_IDENTITY=1
  * (output-identity check between independent index paths — the
  * correctness evidence at scale points where the DuckDB oracle's
  * unfiltered inverted-index join is computationally out of reach:
  * the default sampled-hot path and the exact df-ranked fallback
  * derive their prefixes from DIFFERENT global orders, so equal
  * (count, Σ md5-prefix hashsum) over the verified pair outputs is
  * two independent derivations agreeing, the same rollup contract as
  * `tools/RollupCheck`). Args: one or more SF dirs, e.g.
  * `runMain graft.tools.JaccardProbe /tmp/sf10 /tmp/sf30`.
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

    // PROBE_IDENTITY=1 runs both paths in one session; at scale points
    // where one path's shuffle footprint alone approaches local disk
    // (the ranked leg sorts the full 250M-row df-rank at sf100), run
    // each leg in its own JVM instead — PROBE_IDENTITY=sampled_hot /
    // =ranked_exact — and compare the printed rollups by hand.
    sys.env.get("PROBE_IDENTITY").filter(_ != "").foreach { sel =>
      args.foreach { dir =>
        val rollups = Seq(
          ("sampled_hot", 0L, 512),   // floor=0 forces the filter on
          ("ranked_exact", 0L, -1)    // cap=-1 forces the df-rank path
        ).filter(v => sel == "1" || v._1 == sel).map { case (label, floor, cap) =>
          val docs = graft.core.Tables.documents(spark, dir)
          val (pairs, sec) = timed {
            val p = graft.operators.Dedup.ngramJaccardPairs(
              docs, "doc_id", "text", 5, 0.7, floor, cap)
            val rendered = p.schema.fieldNames.map(c =>
              coalesce(col(c).cast("string"), lit("null")))
            val hashed = conv(
              substring(md5(concat_ws(":", rendered.toSeq: _*)), 1, 15),
              16, 10).cast(org.apache.spark.sql.types.DecimalType(38, 0))
            p.agg(count(lit(1)).as("rows"), sum(hashed).as("hashsum")).head()
          }
          println(f"dir=$dir path=$label rows=${pairs.getLong(0)} " +
            f"hashsum=${pairs.getDecimal(1)} sec=$sec%.1f")
          (pairs.getLong(0), pairs.getDecimal(1))
        }
        if (rollups.size > 1) {
          val verdict =
            if (rollups.distinct.size == 1) "IDENTICAL" else "MISMATCH"
          println(s"dir=$dir identity=$verdict")
        }
      }
      spark.stop()
      return
    }

    args.foreach { dir =>
      (1 to runs).foreach { r =>
        val docs = graft.core.Tables.documents(spark, dir)
        val nDocs = docs.count()
        // the builder itself runs eager jobs (docs.count + hot-shingle
        // df aggregate + collect) — time it separately
        // PROBE_FLOOR / PROBE_HOTCAP override the operator defaults to
        // force an index path: floor=0 forces the prefix filter on,
        // hotcap=-1 forces the exact df-ranked fallback (the
        // hot-list collect is limit(cap+1)=0 rows, 0 <= -1 fails) —
        // the knob behind the sampled-hot vs ranked crossover
        // measurement at sf100+ (ranked trades a full df aggregate +
        // per-doc rank window for minimal-collision prefixes on
        // vocab-saturated corpora).
        val floor = sys.env.getOrElse("PROBE_FLOOR", "20000").toLong
        val hotCap = sys.env.getOrElse("PROBE_HOTCAP", "512").toInt
        val ((cand, sets), buildSec) = timed(
          graft.operators.Dedup.ngramJaccardCandidates(
            docs, "doc_id", "text", 5, 0.7, floor, hotCap))
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
