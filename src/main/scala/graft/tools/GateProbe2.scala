package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Follow-up to [[GateProbe]]: the slow stage is reading the bucketed
  * layout itself (73 s even WITHOUT the prune filter, vs ~6 s for the
  * plain layout of identical rows). This probe isolates WHERE: bare
  * scan cost of each layout (noop-materialized, full columns), file
  * size histograms, and the same scans after
  * `repartition(__bb)`-before-write fixes the file explosion.
  */
object GateProbe2 {

  private def corpusText(i: Long): String =
    s"corpus document number $i alpha beta gamma delta epsilon zeta eta theta iota kappa"

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

    val nCorpus = sys.env.getOrElse("SOAK_CORPUS", "500000").toLong
    val dir = Files.createTempDirectory("graft-gate-probe2").toString

    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        udf(corpusText _).apply(col("id")).as("text"))
    val index = StreamingDedup.corpusIndex(corpus, "doc_id", "text")

    def time[T](label: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"[probe2] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    def fileStats(root: String): (Int, Long, Long) = {
      def walk(p: java.io.File): Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq.flatMap(walk)
        else if (p.getName.endsWith(".parquet")) Seq(p) else Nil
      val fs = walk(new java.io.File(root))
      (fs.size, fs.map(_.length).sum, if (fs.isEmpty) 0 else fs.map(_.length).max)
    }
    def scanAll(path: String, label: String): Unit = {
      val df = spark.read.parquet(path)
      time(s"$label scan (noop, all columns)") {
        df.write.format("noop").mode("overwrite").save()
      }
      time(s"$label scan warm") {
        df.write.format("noop").mode("overwrite").save()
      }
    }

    val plain = s"$dir/plain"
    time("write plain") { index.write.parquet(plain) }
    val (pf, pb, pm) = fileStats(plain)
    println(s"[probe2] plain: files=$pf bytes=$pb max=$pm")
    scanAll(plain, "plain")

    val bucketed = s"$dir/bucketed-naive"
    time("write bucketed naive (current writeBucketedIndex)") {
      StreamingDedup.writeBucketedIndex(index, bucketed, 64)
    }
    val (bf, bb, bm) = fileStats(bucketed)
    println(s"[probe2] bucketed-naive: files=$bf bytes=$bb max=$bm")
    scanAll(bucketed, "bucketed-naive")

    val fixed = s"$dir/bucketed-repart"
    time("write bucketed with repartition(__bb)") {
      index.withColumn("__bb", pmod(xxhash64(col("band")), lit(64L)))
        .repartition(64, col("__bb"))
        .write.partitionBy("__bb").parquet(fixed)
    }
    val (ff, fb, fm) = fileStats(fixed)
    println(s"[probe2] bucketed-repart: files=$ff bytes=$fb max=$fm")
    scanAll(fixed, "bucketed-repart")

    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
