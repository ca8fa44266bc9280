package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup
import graft.operators.Dedup

/** Third gate probe: [[GateProbe2]] showed the bare scan of the naive
  * bucketed layout costs ~1.4 s — so GateScanBench's 53–73 s pruned
  * gate is in the JOIN stage, not the file explosion. This probe runs
  * the SAME 256-doc gate against the SAME 2M index rows from (a) the
  * plain layout, (b) the naive bucketed layout, (c) bucketed after
  * repartition-on-write, in ONE JVM, and also counts raw band-join
  * candidates per layout (they must be equal — content is identical),
  * timing each piece. If candidates are equal but walls differ, the
  * difference is plan/codegen shape, and the executed plans are dumped
  * for diffing.
  */
object GateProbe3 {

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
    val dir = Files.createTempDirectory("graft-gate-probe3").toString

    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        udf(corpusText _).apply(col("id")).as("text"))
    val index = StreamingDedup.corpusIndex(corpus, "doc_id", "text")

    def time[T](label: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"[probe3] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }

    val plain = s"$dir/plain"
    index.write.parquet(plain)
    val naive = s"$dir/naive"
    StreamingDedup.writeBucketedIndex(index, naive, 64)
    val repart = s"$dir/repart"
    index.withColumn("__bb", pmod(xxhash64(col("band")), lit(64L)))
      .repartition(64, col("__bb"))
      .write.partitionBy("__bb").parquet(repart)

    val batch = (0L until 256L)
      .map(v => (10000L + v, incomingText(v, nCorpus)))
      .toDF("doc_id", "text").localCheckpoint()
    val banded = batch
      .select(col("doc_id"), Dedup.hashedShingleSet(col("text"), 5).as("__dset"))
      .withColumn("__dbands", Dedup.rowBandArray(col("__dset"), 8, 2))
      .select(col("doc_id"), col("__dset"), col("__dbands"),
        explode(col("__dbands")).as("band"))
      .localCheckpoint()

    def layoutDf(name: String): DataFrame = name match {
      case "plain"  => spark.read.parquet(plain)
      case "naive"  => spark.read.parquet(naive).drop("__bb")
      case "repart" => spark.read.parquet(repart).drop("__bb")
      case _        => sys.error(name)
    }

    // raw band-join candidate count per layout — must be identical
    Seq("plain", "naive", "repart").foreach { name =>
      val idx = layoutDf(name)
      val c = time(s"$name candidate count") {
        banded.join(idx, Seq("band")).count()
      }
      println(s"[probe3] $name candidates: $c")
    }

    // full gate per layout
    Seq("plain", "naive", "repart").foreach { name =>
      val idx = layoutDf(name)
      val flags = StreamingDedup.nearDupFlags(batch, idx, "doc_id", "text")
      time(s"$name full gate") {
        flags.write.format("noop").mode("overwrite").save()
      }
      val n = flags.count()
      println(s"[probe3] $name flags: $n")
    }

    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
