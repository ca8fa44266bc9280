package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Scale probe for [[graft.operators.Bpe.trainMerges]]: the
  * corpus-pass / vocab-iteration split measured at a scale decade —
  * word-table wall (the only corpus-sized stage), then per-merge
  * iteration wall over the vocab table.
  *
  * {{{
  * BPE_DIR=target/testdata/sf10z BPE_MERGES=10 sbt 'runMain graft.tools.BpeProbe'
  * }}}
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("BPE_DIR", "target/testdata/sf10z")
    val nMerges = sys.env.getOrElse("BPE_MERGES", "10").toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[bpe-probe] dir=$dir docs=${docs.count()} merges=$nMerges")

    val t0 = System.nanoTime()
    val words = Bpe.wordTable(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = words.count()
    println(f"[bpe-probe] word table: $vocab%d words, " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs (the one corpus pass)")

    val t1 = System.nanoTime()
    val merges = Bpe.trainMerges(docs, "text", nMerges)
    val trainWall = (System.nanoTime() - t1) / 1e9
    println(f"[bpe-probe] trainMerges($nMerges) wall=$trainWall%.1fs " +
      f"(${trainWall / nMerges}%.1fs/merge, includes its own word-table pass)")
    merges.foreach { case (r, a, b) => println(s"[bpe-probe] merge $r: '$a' + '$b'") }
    words.unpersist()
    println("[bpe-probe] OK")
    spark.stop()
  }
}
