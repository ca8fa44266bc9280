package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): ONE JSON line on stdout with
  * per-query and total wall time over SPARK_GRAFT_SF_DIR, also written
  * to `bench_out.json` so the driver's parse is robust to any stray
  * console noise. Spark logs are forced to ERROR (they go to stderr);
  * the JSON line is the only stdout output.
  *
  * Each query is forced through a `noop` sink — unlike `count()`,
  * which lets Catalyst prune away every computed column, noop
  * materializes the full result rows, so the numbers reflect real
  * operator cost.
  *
  * A query that throws is recorded in the `errors` map (name →
  * exception) instead of being silently swallowed. Error handling is
  * designed so a crash can neither fabricate a fast per-query number
  * nor silently shrink the total: every run is attempted (a transient
  * failure doesn't discard the query — the surviving runs' median
  * counts), errored runs never enter the per-query statistic, and a
  * query with NO successful run is kept out of `queries` but its
  * observed fail wall time still contributes to `value`, with a
  * top-level `failed_count` so no consumer can read the total without
  * seeing the failure.
  *
  * Self-defense against machine noise: each query runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the lower
  * median, so one contention-skewed sample cannot poison the ledger.
  * Runs are SWEEP-MAJOR (whole surface × runs, not runs × query), so
  * a contention window at session start poisons at most one sweep of
  * each query — consecutive same-query runs would hand a multi-minute
  * window two of three samples and ride through the median.
  * The JSON carries the per-run raw times in run order (failed runs
  * appear as NEGATIVE durations) and the OS load average at start/end,
  * so a poisoned or partially-failing sweep is self-identifying.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // high-water initial shuffle width, AQE-coalesced to 64 MB
      // targets — see GraftSession for the decade-sweep rationale
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // without this, persisted plans materialize at the full initial
      // width (cached plans bypass AQE coalescing) — 256 near-empty
      // cached partitions tax every downstream stage at small corpora;
      // measured 2× on the dedup pipelines at sf0.1 (see GraftSession)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM warmup outside the timed region (first query otherwise pays
    // session startup + the noop sink's first materialization)
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Codegen pre-compilation: generate and Janino-compile every
    // query's whole-stage-codegen classes into the shared
    // CodeGenerator cache (keyed by generated source) WITHOUT running
    // any job — codegenStringSeq compiles each stage to produce its
    // bytecode stats. Timed runs then hit the cache and measure
    // execution, not compiler cold starts; real IO/shuffle cold costs
    // still land on the first timed run, by design. (AQE-replanned
    // stages may still generate novel classes at runtime — those few
    // compiles remain visible in raw_times.)
    // SPARK_GRAFT_BENCH_ONLY=a,b,c — dev-loop filter for profiling one
    // kernel without paying the full sweep; the driver never sets it,
    // so round artifacts always cover the whole surface.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (_, fn) =>
      try org.apache.spark.sql.execution.debug.codegenStringSeq(
        fn(spark, sfDir).queryExecution.executedPlan): Unit
      catch { case _: Throwable => () }
    }

    // deterministic name order: JVM/codegen warmup cost lands on the
    // same queries every round, so per-query numbers compare across
    // rounds. SPARK_GRAFT_BENCH_RUNS=N samples each query N times
    // (default 3) and reports the lower median of the SUCCESSFUL runs.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val raw = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    def lowerMedian(ts: Seq[Double]): Double = ts.sorted.apply((ts.length - 1) / 2)
    var failedCount = 0
    var failedTime = 0.0
    // SWEEP-MAJOR run order: the full surface runs once, then again,
    // then again — NOT 3 consecutive runs per query. A transient
    // contention window at session start (the round-9 driver artifact:
    // k2/k3/k4/salted inflated 0.4 → 1.4-2.3 s while the same HEAD on
    // a quiet box read round-8 numbers, raw triples like
    // [2.02, 2.68, 0.60] — two of three consecutive runs poisoned, so
    // the lower-median kept the noise) now lands on sweep 1 of every
    // query and the median across well-separated sweeps discards it.
    // Same statistics, same totals — only the sampling decorrelates.
    val ok = scala.collection.mutable.LinkedHashMap(
      selected.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    val bad = scala.collection.mutable.LinkedHashMap(
      selected.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    val chron = scala.collection.mutable.LinkedHashMap(
      selected.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    // per-sweep wall totals (successful + failed attempts): the
    // box-state self-adjudication input — on a quiet box the separated
    // sweeps agree; a loaded/decaying session makes them disagree
    val sweepTotals = Array.fill(runs)(0.0)
    // attempt every run: a transient failure (contention OOM, lost
    // task) must not discard the query — surviving runs still count
    (0 until runs).foreach { sweep =>
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          ok(name) += t
          chron(name) += t
          sweepTotals(sweep) += t
        } catch {
          case e: Throwable =>
            val t = (System.nanoTime() - t0) / 1e9
            bad(name) += t
            chron(name) += -t // negative = failed run, duration preserved
            sweepTotals(sweep) += t
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(300)
        }
      }
    }
    val results = selected.flatMap { case (name, _) =>
      // raw_times keeps EVERY run in sweep order; failed runs are
      // encoded as negative durations so a partially-failing sweep is
      // visible without cross-referencing the errors map
      raw(name) = chron(name).toSeq
      if (ok(name).nonEmpty) Some(name -> lowerMedian(ok(name).toSeq))
      else {
        // never fabricate a per-query number from crash times, but the
        // observed wall cost still lands in the total so an all-failed
        // query cannot "speed up" the benchmark unnoticed
        failedCount += 1
        failedTime += lowerMedian(bad(name).toSeq)
        None
      }
    }
    val loadEnd = osBean.getSystemLoadAverage

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val raws = raw.map { case (k, ts) => jstr(k) + ":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + failedTime
    // box-state verdict: two rounds of driver artifacts misread as code
    // regressions (r9 consecutive-sample windows, r10 a uniformly slow
    // session convicted only by a manual old-code A/B). Sweep-major
    // sampling makes the separated sweep totals a built-in control:
    // if they disagree by >15% the box was NOT quiet during this run
    // and the artifact should be read against the MINIMUM sweep, not
    // the median. sweep 1 additionally carries first-touch IO warmup,
    // so the verdict compares the later sweeps when runs >= 3 and only
    // flags warmup if sweep 1 alone is the outlier.
    val sweeps = sweepTotals.toSeq
    val boxState =
      if (runs < 2) "unknown"
      else if (runs == 2) {
        // two sweeps cannot separate first-touch IO warmup from real
        // noise (the spread necessarily includes sweep 1), so a quiet
        // box with cold caches must not read as "noisy"
        val spread = (sweeps.max - sweeps.min) / math.max(sweeps.min, 1e-9)
        if (spread > 0.15) "warmup_or_noisy" else "quiet"
      } else {
        val later = sweeps.tail
        val spread = (later.max - later.min) / math.max(later.min, 1e-9)
        if (spread > 0.15) "noisy"
        else if ((sweeps.head - later.min) / math.max(later.min, 1e-9) > 0.15)
          "warmup_only"
        else "quiet"
      }
    val sweepsJson = sweeps.mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed_count":$failedCount,"runs":$runs,"stat":"lower_median","load_avg_start":$loadStart,"load_avg_end":$loadEnd,"sweep_totals":$sweepsJson,"box_state":${jstr(boxState)},"raw_times":$raws,"sf":${jstr(sfDir)}}"""
    Files.write(Paths.get("bench_out.json"),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
