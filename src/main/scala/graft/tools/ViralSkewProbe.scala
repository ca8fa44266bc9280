package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 lead item: the viral-key skew anchor for the
  * count-over-window df-thinning used by
  * [[graft.operators.Dedup.sharedSpanPairs]] (drop keys with df >
  * maxDf) and [[graft.operators.Dedup.dropDuplicateSubstrings]] (keep
  * keys with df >= minOcc).
  *
  * THE QUESTION: `count(1) over (partition by __h)` ships EVERY
  * occurrence of a hash to that hash's one window task with NO partial
  * aggregation before the threshold can drop it — a genuinely viral
  * span (one cookie banner in 1% of a 100 TB corpus => df in the
  * hundreds of millions) concentrates its whole occurrence list in ONE
  * task, and WindowExec cannot be skew-split (the semantics need the
  * whole partition together). The groupBy+join-back form is skew-proof
  * by construction in its COUNT (map-side partial aggregation emits at
  * most one row per key per map task) and its join-back is either
  * map-only (broadcast of the filtered key sliver) or AQE-skew-
  * splittable (sort-merge left-semi/anti). Round 13 measured the
  * window form 2x cheaper at a 23M-span Zipf corpus — but Zipf's
  * hottest keys are modest; this probe PLANTS the adversarial key and
  * measures both forms at increasing viral df.
  *
  * CONTROLLED SPAN TABLE (no text, no kernel — the thinning stage
  * operates on the exploded (doc, hash) table, identical under either
  * formulation, and the kernel cost upstream is form-independent):
  *  - `bgUnique` rows with globally unique hashes (df = 1: the
  *    Heaps-law tail that IS most of a real corpus's window mass);
  *  - `bgDupKeys` hashes each occurring `bgDupRep` times (the
  *    realistic duplicated sliver — sized to push the survivor set of
  *    the minOcc form past the broadcast threshold so the probe
  *    exercises the shuffle semi-join path, not just the broadcast
  *    one);
  *  - `viralKeys` hashes each occurring `viralDf` times (the plant).
  *
  * Forms measured, both thinning semantics:
  *  - window:  .withColumn(df, count over partitionBy(h)).where(pred)
  *  - group:   dfAgg = spans.groupBy(h).count (partial-agg combine),
  *             CAP-DROP: anti-join the (tiny) over-cap key sliver,
  *             MINOCC-KEEP: semi-join the survivor sliver
  *             (AQE picks broadcast vs SMJ + skew split).
  *
  * Output row counts are asserted EQUAL across forms at every point —
  * the swap is checksum-identical by construction, the probe pins it.
  *
  * {{{
  * sbt 'runMain graft.tools.ViralSkewProbe'            # default ladder
  * VIRAL_DFS=0,10000000,30000000 sbt 'runMain ...'     # custom ladder
  * }}}
  */
object ViralSkewProbe {

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
    import spark.implicits._

    val bgUnique = sys.env.getOrElse("BG_UNIQUE", "40000000").toLong
    val bgDupKeys = sys.env.getOrElse("BG_DUP_KEYS", "5000000").toLong
    val bgDupRep = sys.env.getOrElse("BG_DUP_REP", "2").toInt
    val viralKeys = sys.env.getOrElse("VIRAL_KEYS", "4").toInt
    val viralDfs = sys.env.getOrElse("VIRAL_DFS", "0,2000000,10000000,30000000")
      .split(",").map(_.trim.toLong).toSeq
    val cap = sys.env.getOrElse("SPAN_CAP", "64").toInt
    val minOcc = sys.env.getOrElse("SPAN_MINOCC", "2").toInt

    // hash-space layout keeps the three strata disjoint:
    //   unique:  [1<<40, 1<<40 + bgUnique)
    //   dup:     [1<<41, 1<<41 + bgDupKeys)
    //   viral:   [0, viralKeys)
    def spansFor(viralDf: Long): DataFrame = {
      val uniq = spark.range(bgUnique)
        .select((col("id") % 1000000L).as("__id"),
          (col("id") + (1L << 40)).as("__h"))
      val dup = spark.range(bgDupKeys * bgDupRep)
        .select((col("id") % 999983L).as("__id"),
          (col("id") % bgDupKeys + (1L << 41)).as("__h"))
      val viral = spark.range(viralKeys * viralDf)
        .select((col("id") % 999979L).as("__id"),
          (col("id") % viralKeys).as("__h"))
      uniq.unionByName(dup).unionByName(viral)
    }

    // THE conviction metric is max task duration, not wall: local[32]
    // overlaps a hot task with 31 threads of other work, hiding skew
    // that a stage barrier on a real cluster puts on the critical path
    // (every other task finishes and WAITS for the one holding the
    // viral key's occurrence list). A listener records the longest
    // single task of each measurement.
    @volatile var maxTaskMs = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        if (d > maxTaskMs) maxTaskMs = d
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // two timed reps per form (first carries JIT/page-cache warm-up);
    // wall for both, max-task for the second (steady state)
    def timed(f: => Long): (Double, Double, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      val t1 = (System.nanoTime() - t0) / 1e9
      maxTaskMs = 0L
      val t2 = System.nanoTime()
      val n2 = f
      val t3 = (System.nanoTime() - t2) / 1e9
      assert(n == n2, s"reps disagree: $n vs $n2")
      // listener events drain asynchronously; give the bus a moment
      Thread.sleep(1000)
      (t1, t3, maxTaskMs / 1e3, n)
    }

    // sharedSpanPairs semantics: DROP keys over the cap
    def capWindow(spans: DataFrame): Long = spans
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .where(col("__df") <= cap).drop("__df")
      .count()
    def capGroup(spans: DataFrame): Long = {
      val over = spans.groupBy(col("__h"))
        .agg(count(lit(1)).as("__df"))
        .where(col("__df") > cap).select(col("__h"))
      spans.join(over, Seq("__h"), "left_anti").count()
    }

    // dropDuplicateSubstrings semantics: KEEP keys at/over minOcc
    def occWindow(spans: DataFrame): Long = spans
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .where(col("__df") >= minOcc).drop("__df")
      .count()
    def occGroup(spans: DataFrame): Long = {
      val keep = spans.groupBy(col("__h"))
        .agg(count(lit(1)).as("__df"))
        .where(col("__df") >= minOcc).select(col("__h"))
      spans.join(keep, Seq("__h"), "left_semi").count()
    }

    println(s"[viral-skew] bgUnique=$bgUnique bgDupKeys=$bgDupKeys" +
      s" x$bgDupRep viralKeys=$viralKeys cap=$cap minOcc=$minOcc" +
      s" cpus=$cpus")
    viralDfs.foreach { vdf =>
      val spans = spansFor(vdf)
      val total = bgUnique + bgDupKeys * bgDupRep + viralKeys * vdf
      val (tcw1, tcw2, mcw, ncw) = timed(capWindow(spans))
      val (tcg1, tcg2, mcg, ncg) = timed(capGroup(spans))
      val (tow1, tow2, mow, now) = timed(occWindow(spans))
      val (tog1, tog2, mog, nog) = timed(occGroup(spans))
      assert(ncw == ncg, s"cap-drop forms disagree: $ncw vs $ncg")
      assert(now == nog, s"minocc-keep forms disagree: $now vs $nog")
      println(f"""{"viral_df":$vdf,"rows":$total,"cap_window_s":[$tcw1%.2f,$tcw2%.2f],"cap_window_maxtask_s":$mcw%.2f,"cap_group_s":[$tcg1%.2f,$tcg2%.2f],"cap_group_maxtask_s":$mcg%.2f,"cap_rows":$ncw,"occ_window_s":[$tow1%.2f,$tow2%.2f],"occ_window_maxtask_s":$mow%.2f,"occ_group_s":[$tog1%.2f,$tog2%.2f],"occ_group_maxtask_s":$mog%.2f,"occ_rows":$now}""")
    }
    spark.stop()
  }
}
