package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Stage-level diagnosis of the pruned streaming gate after
  * [[GateScanBench]] measured it 8.6× SLOWER than the full-index scan
  * at a 256-doc batch (53 s vs 6.2 s, 2M-row index): is the bill the
  * bucketed layout's file count (partitionBy without a repartition →
  * tasks × buckets small files), the join strategy flipping (the
  * pruned/filtered index side mis-estimated and broadcast), or the
  * pruned path's fixed overhead (sidecar + localCheckpoint + distinct
  * collect)?
  *
  * {{{
  * SOAK_CORPUS=500000 sbt 'runMain graft.tools.GateProbe'
  * }}}
  */
object GateProbe {

  private def corpusText(i: Long): String =
    s"corpus document number $i alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def nearText(i: Long): String = corpusText(i) + " lambda"
  private def freshText(v: Long): String =
    s"fresh u$v document u$v with unique u$v content u$v run u$v more u$v filler u$v tokens u$v"
  private def incomingText(v: Long, nCorpus: Long): String = (v % 3) match {
    case 0 => corpusText(v % nCorpus)
    case 1 => nearText(v % nCorpus)
    case _ => freshText(v)
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
    import spark.implicits._

    val nCorpus = sys.env.getOrElse("SOAK_CORPUS", "500000").toLong
    val dir = Files.createTempDirectory("graft-gate-probe").toString
    val bucketedPath = s"$dir/index-bucketed"

    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        udf(corpusText _).apply(col("id")).as("text"))
    val index = StreamingDedup.corpusIndex(corpus, "doc_id", "text")
    StreamingDedup.writeBucketedIndex(index, bucketedPath, 64)

    // fact 1: file count of the bucketed layout
    def countFiles(p: java.io.File): Int =
      if (p.isDirectory) p.listFiles().map(countFiles).sum
      else if (p.getName.endsWith(".parquet")) 1 else 0
    val nFiles = countFiles(new java.io.File(bucketedPath))
    println(s"[probe] bucketed index parquet files: $nFiles")

    val batch = (0L until 256L)
      .map(v => (10000L + v, incomingText(v, nCorpus)))
      .toDF("doc_id", "text").localCheckpoint()

    // fact 2: stage timings of the pruned path, run piecewise
    def time[T](label: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val pruned = time("nearDupFlagsPruned plan construction") {
      StreamingDedup.nearDupFlagsPruned(batch, bucketedPath, "doc_id", "text")
    }
    // fact 3: the join strategy the pruned plan actually got
    println("[probe] pruned executed plan (joins + scans):")
    time("pruned materialize") {
      pruned.write.format("noop").mode("overwrite").save()
    }
    val plan = pruned.queryExecution.executedPlan.toString
    plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("FileScan") || l.contains("Broadcast"))
      .map(_.trim.take(200))
      .foreach(l => println(s"[probe]   $l"))

    // fact 4: same join, but reading the index WITHOUT the isin filter
    val plainFromBucketed = time("full gate over the bucketed files") {
      val idx = spark.read.parquet(bucketedPath).drop("__bb")
      val f = StreamingDedup.nearDupFlags(batch, idx, "doc_id", "text")
      f.write.format("noop").mode("overwrite").save(); f
    }
    println("[probe] full-gate-over-bucketed-layout joins:")
    plainFromBucketed.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Broadcast"))
      .map(_.trim.take(200)).foreach(l => println(s"[probe]   $l"))

    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
