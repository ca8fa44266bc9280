package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Throughput A/B for the per-row band signing the streaming dedup
  * gate runs on every micro-batch: the fused
  * [[graft.expressions.MinHashBands]] kernel vs the HOF chain it
  * replaced (k×(`transform`+`array_min`) + `concat_ws` — kept here
  * verbatim as the baseline). Input is the sf dir's documents table
  * replicated to `PROBE_DOCS` rows (default 500k) so the signing
  * stage, not the scan, dominates. Reports rows/sec per variant over
  * `PROBE_RUNS` timed passes (first pass warms the JIT and the page
  * cache; it is reported but excluded from the best-of line).
  *
  * Usage: `runMain graft.tools.BandKernelBench <sfDir>`
  */
object BandKernelBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandKernelBench <sfDir>")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val target = sys.env.getOrElse("PROBE_DOCS", "500000").toLong
    val runs = sys.env.getOrElse("PROBE_RUNS", "4").toInt
    val (k, rpb) = (8, 2)

    val base = graft.core.Tables.documents(spark, args(0)).select("text")
    val nBase = base.count()
    val copies = math.max(1L, target / math.max(1L, nBase))
    val docs = base.crossJoin(
        spark.range(copies).select(col("id").as("__copy")))
      .select(col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()

    def hofBands(set: org.apache.spark.sql.Column) = {
      val sigs = (0 until k).map { i =>
        array_min(transform(set, h => graft.functions.HashFunctions.seeded(h, i)))
      }
      array((0 until k / rpb).map { b =>
        val parts = (0 until rpb).map(r => sigs(b * rpb + r))
        concat_ws(":", lit(b) +: parts: _*)
      }: _*)
    }
    val set = Dedup.hashedShingleSet(col("text"), 5)
    // Drain over EVERY band key: element_at(__b, 1) would let
    // SimplifyExtractValueOps prune the HOF leg's CreateArray down to
    // band 0 only (2 of k sigs computed), understating HOF cost ~4×
    // while the fused kernel always computes all bands. aggregate()
    // over the whole array forces every element of both variants.
    def drain(df: DataFrame): Long =
      df.select(sum(aggregate(col("__b"), lit(0L),
        (acc, x) => acc + length(x)))).head().getLong(0)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "fused" -> (() => docs.select(Dedup.rowBandArray(set, k, rpb).as("__b"))),
      "hof" -> (() => docs.select(hofBands(set).as("__b"))))

    for ((name, mk) <- variants) {
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        drain(mk())
        (System.nanoTime() - t0) / 1e9
      }
      val best = secs.drop(1).min
      println(f"$name%-6s rows=$n best=${best}%.2fs " +
        f"rate=${n / best / 1e6}%.2fM rows/s raw=${secs.map(s => f"$s%.2f")}")
    }
    spark.stop()
  }
}
