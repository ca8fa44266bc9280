package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** A/B of the streaming gate's index bill: full-index
  * [[graft.streaming.StreamingDedup.nearDupFlags]] vs the
  * partition-pruned [[graft.streaming.StreamingDedup.nearDupFlagsPruned]]
  * against a [[graft.streaming.StreamingDedup.writeBucketedIndex]] lake
  * index — the measurement the round-9 bucketed-gate commit deferred.
  *
  * {{{
  * SOAK_CORPUS=500000 sbt 'runMain graft.tools.GateScanBench'
  * }}}
  *
  * Both variants read the SAME physical corpus index content from
  * parquet (the pruned variant from the bucketed layout, the plain
  * variant from an unpartitioned copy of identical rows), gate the
  * SAME deterministic micro-batch (1/3 verbatim, 1/3 near-dup, 1/3
  * fresh — `DedupGateSoak`'s feed pattern), and are forced through a
  * noop sink. Per (batch size, variant): runs=3, lower median, raw
  * times printed. Output equality is asserted per batch size (sorted
  * collect — flag output is O(batch), bounded).
  *
  * The interesting economics: the pruned bill is
  * O(index · buckets_hit / nBuckets), and buckets_hit saturates at
  * nBuckets as the batch grows (a batch with ≥ ~64·ln(64) ≈ 266
  * distinct band keys touches every bucket w.h.p.), so the pruning
  * win should be large for trickle batches and gone for bulk ones —
  * this tool measures where the crossover sits on a real index.
  *
  * GATE_CORPUS_DIR selects the corpus: a parquet documents dir
  * (doc_id, text — e.g. a zipf `gen_sf.py` output) gives the
  * realistic measurement; unset falls back to `DedupGateSoak`'s
  * template text, which is DEGENERATE for this purpose — all corpus
  * docs share 6 of 10 shingles, so a 256-doc batch generates 96M
  * band-join candidates against a 500k-doc corpus and the gate
  * measures jaccard-confirm skew, not index scan (see GateProbe3).
  */
object GateScanBench {

  private def corpusText(i: Long): String =
    s"corpus document number $i alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def freshText(v: Long): String =
    s"fresh u$v document u$v with unique u$v content u$v run u$v more u$v filler u$v tokens u$v"

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

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val nBuckets = sys.env.getOrElse("GATE_BUCKETS", "64").toInt
    val dir = Files.createTempDirectory("graft-gate-bench").toString
    val plainPath = s"$dir/index-plain"
    val bucketedPath = s"$dir/index-bucketed"

    val corpusDir = sys.env.get("GATE_CORPUS_DIR")
    val corpus = corpusDir match {
      case Some(d) =>
        spark.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      case None =>
        spark.range(sys.env.getOrElse("SOAK_CORPUS", "500000").toLong)
          .select(col("id").as("doc_id"),
            udf(corpusText _).apply(col("id")).as("text"))
    }
    val nCorpus = corpus.count()
    // realistic batches draw their verbatim/near-dup texts from the
    // corpus itself; pin the sampled texts once so batch construction
    // doesn't rescan the documents table per run
    val sampledTexts: Long => String = corpusDir match {
      case Some(_) =>
        val maxBatch = 16384
        val texts = corpus.orderBy("doc_id").limit(maxBatch)
          .select("text").as[String](org.apache.spark.sql.Encoders.STRING)
          .collect()
        v => texts((v % texts.length).toInt)
      case None => v => corpusText(v % nCorpus)
    }
    def batchText(v: Long): String = (v % 3) match {
      case 0 => sampledTexts(v)
      case 1 => sampledTexts(v) + " zzappended"
      case _ => freshText(v)
    }
    val t0 = System.nanoTime()
    val index = StreamingDedup.corpusIndex(corpus, "doc_id", "text")
    StreamingDedup.writeBucketedIndex(index, bucketedPath, nBuckets)
    index.write.mode("overwrite").parquet(plainPath)
    val buildS = (System.nanoTime() - t0) / 1e9
    val indexRows = spark.read.parquet(plainPath).count()
    println(f"[gate-bench] corpus=$nCorpus index_rows=$indexRows " +
      f"build_s=$buildS%.1f nbuckets=$nBuckets")

    def batchDf(size: Int): DataFrame =
      (0L until size.toLong)
        .map(v => (100000000L + v, batchText(v)))
        .toDF("doc_id", "text")

    def time(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    def lowerMedian(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val sizes = sys.env.getOrElse("GATE_BATCHES", "32,256,2048,16384")
      .split(",").map(_.trim.toInt).toSeq
    val results = sizes.map { size =>
      val batch = batchDf(size).localCheckpoint()
      val plainIdx = spark.read.parquet(plainPath)
      def plainRun(): DataFrame =
        StreamingDedup.nearDupFlags(batch, plainIdx, "doc_id", "text")
      def prunedRun(): DataFrame =
        StreamingDedup.nearDupFlagsPruned(batch, bucketedPath, "doc_id", "text")

      val plainTimes = (1 to runs).map { _ =>
        time(plainRun().write.format("noop").mode("overwrite").save())
      }
      val prunedTimes = (1 to runs).map { _ =>
        time(prunedRun().write.format("noop").mode("overwrite").save())
      }
      val a = plainRun().select("doc_id", "corpus_id").as[(Long, Long)]
        .collect().sorted.toSeq
      val prunedDf = prunedRun()
      val b = prunedDf.select("doc_id", "corpus_id").as[(Long, Long)]
        .collect().sorted.toSeq
      require(a == b, s"pruned output differs at batch=$size: " +
        s"plain=${a.size} pruned=${b.size}")
      // bytes the pruned scan actually reads vs the full index — THE
      // scale metric: local walls are page-cache-warmed, but on an
      // object store the bill is bytes listed+fetched, and this ratio
      // is what the partition filter buys
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansOf(ad.executedPlan)
          case sc: org.apache.spark.sql.execution.FileSourceScanExec => Seq(sc)
        }.flatten
      val idxScan = scansOf(prunedDf.queryExecution.executedPlan)
        .filter(_.partitionFilters.exists(_.toString.contains("__bb")))
      val prunedParts = idxScan.headOption.map(s =>
        s.relation.location.listFiles(s.partitionFilters, Nil)).getOrElse(Nil)
      val prunedBytes = prunedParts.flatMap(_.files.map(_.getLen)).sum
      val prunedFiles = prunedParts.map(_.files.length).sum
      val totalStatus = new java.io.File(bucketedPath)
      def walk(p: java.io.File): Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq.flatMap(walk)
        else if (p.getName.endsWith(".parquet")) Seq(p) else Nil
      val totalBytes = walk(totalStatus).map(_.length).sum
      // buckets the batch actually touched, recomputed the same way
      // the pruned path derives its IN-list
      val bucketsHit = graft.operators.Dedup
        .rowBandArray(graft.operators.Dedup.hashedShingleSet(col("text"), 5), 8, 2)
      val hit = batch
        .select(explode(bucketsHit).as("band"))
        .select(pmod(xxhash64(col("band")), lit(nBuckets.toLong)).as("bb"))
        .distinct().count()
      val line = f"""{"batch":$size,"flags":${a.size},"buckets_hit":$hit,""" +
        f""""nbuckets":$nBuckets,"plain_s":${lowerMedian(plainTimes)}%.3f,""" +
        f""""pruned_s":${lowerMedian(prunedTimes)}%.3f,""" +
        f""""pruned_files":$prunedFiles,"pruned_bytes":$prunedBytes,""" +
        f""""index_bytes":$totalBytes,""" +
        f""""plain_raw":[${plainTimes.map(t => f"$t%.3f").mkString(",")}],""" +
        f""""pruned_raw":[${prunedTimes.map(t => f"$t%.3f").mkString(",")}]}"""
      println(line)
      line
    }
    println(s"""{"corpus":$nCorpus,"index_rows":$indexRows,"build_s":$buildS,"results":[${results.mkString(",")}]}""")
    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
