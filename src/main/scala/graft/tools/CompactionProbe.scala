package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats
import graft.streaming.StatsMaintenance

/** Evidence probe for the "periodic re-cluster publish" roadmap item:
  * after many folds and retractions, does key scatter in the
  * maintained stats table actually cost anything at the decade — or
  * is the hypothesized compaction win not there?
  *
  * Builds a maintained line-df store from a configurable number of
  * folds + interleaved retractions over the 500k-doc Zipf corpus
  * (or reuses an existing store, e.g. the StatsSoak leftover), then
  * measures, scattered vs freshly key-sorted rewrite of the SAME rows:
  *   - full-scan aggregate wall (the readStats consumer shape),
  *   - a day-partial equi-join wall (the `*With` scoring shape),
  *   - a fold wall (mergeStats + table write, the maintenance shape),
  *   - on-disk parquet bytes (encoding efficiency).
  *
  * {{{
  * COMPACT_DIR=target/testdata/sf10z COMPACT_BATCHES=60 \
  *   sbt 'runMain graft.tools.CompactionProbe'   # or COMPACT_STORE=<path>
  * }}}
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("COMPACT_DIR", "target/testdata/sf10z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val keys = Seq("line_key")
    val counts = Seq("line_df")
    def partialOf(b: DataFrame): DataFrame =
      CorpusStats.lineDf(b, "doc_id", "text")

    val store = sys.env.get("COMPACT_STORE") match {
      case Some(s) =>
        println(s"[compact-probe] reusing store $s")
        s
      case None =>
        val nB = sys.env.getOrElse("COMPACT_BATCHES", "60").toInt
        val s = java.nio.file.Files
          .createTempDirectory("graft-compact").toString
        println(s"[compact-probe] building store: $nB folds over $nDocs " +
          s"docs at $s")
        val t = System.nanoTime()
        (0L until nB.toLong).foreach { id =>
          StatsMaintenance.foldBatch(
            docs.where(pmod(col("doc_id"), lit(nB.toLong)) === id),
            id, s, keys, counts, partialOf)
          if (id >= 10 && id % 15 == 7)  // interleaved deletion churn
            StatsMaintenance.retractBatch(spark, s,
              partialOf(docs.where(
                pmod(col("doc_id"), lit(nB.toLong)) === (id - 5))),
              keys, counts)
        }
        println(f"[compact-probe] built in ${(System.nanoTime() - t) / 1e9}%.0fs")
        s
    }

    val scattered = StatsMaintenance.readStats(spark, store).get
    val rows = scattered.count()
    val sortedPath = java.nio.file.Files
      .createTempDirectory("graft-compact-sorted").toString + "/t"
    scattered.sort(keys.map(col): _*).write.mode("overwrite")
      .parquet(sortedPath)
    val sorted = spark.read.parquet(sortedPath)
    def dirBytes(p: String): Long = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(root).getLength
    }
    val curDir = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("v="))
      .maxBy(_.getName.stripPrefix("v=").toLong).toString
    println(s"[compact-probe] table rows=$rows " +
      s"scattered=${dirBytes(curDir)}B sorted=${dirBytes(sortedPath)}B")

    def med(walls: Seq[Double]): Double = walls.sorted.apply(walls.size / 2)
    def time3(tag: String, f: () => Unit): Double = {
      val walls = (1 to 3).map { _ =>
        val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e9
      }
      val m = med(walls)
      println(f"[compact-probe] $tag: median=$m%.2fs " +
        s"(${walls.map(w => f"$w%.2f").mkString(",")})")
      m
    }

    // consumer shape 1: full-scan aggregate
    def scanAgg(t: DataFrame): Unit =
      t.agg(count(lit(1)), sum(col("line_df")),
        bit_xor(xxhash64(col("line_key")))).collect(): Unit
    val sScan = time3("scan-agg scattered", () => scanAgg(scattered))
    val oScan = time3("scan-agg sorted   ", () => scanAgg(sorted))

    // consumer shape 2: a new day's partial joined against the table
    val day = partialOf(docs.where(pmod(col("doc_id"), lit(97L)) === 0))
      .localCheckpoint(true)
    def joinDay(t: DataFrame): Unit =
      day.join(t.withColumnRenamed("line_df", "hist_df"), keys)
        .agg(count(lit(1)), sum(col("hist_df"))).collect(): Unit
    val sJoin = time3("day-join scattered", () => joinDay(scattered))
    val oJoin = time3("day-join sorted   ", () => joinDay(sorted))

    // maintenance shape: one fold (merge + full table write)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-compact-fold").toString
    def fold(t: DataFrame, tag: String): Double = {
      val walls = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        CorpusStats.mergeStats(Seq(t, day), keys, counts)
          .write.mode("overwrite").parquet(s"$scratch/$tag$i")
        (System.nanoTime() - t0) / 1e9
      }
      val m = med(walls)
      println(f"[compact-probe] fold-$tag: median=$m%.2fs " +
        s"(${walls.map(w => f"$w%.2f").mkString(",")})")
      m
    }
    val sFold = fold(scattered, "scattered")
    val oFold = fold(sorted, "sorted")

    println(f"[compact-probe] ratios sorted/scattered: " +
      f"scan=${oScan / sScan}%.2f join=${oJoin / sJoin}%.2f " +
      f"fold=${oFold / sFold}%.2f " +
      f"bytes=${dirBytes(sortedPath).toDouble / dirBytes(curDir)}%.2f")
    println("[compact-probe] done")
    spark.stop()
  }
}
