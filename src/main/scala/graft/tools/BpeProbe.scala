package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Scale probe for BPE learning: the corpus-pass / vocab-iteration
  * split measured at a scale decade — word-table wall (the only
  * corpus-sized stage), then the merge loop over the vocab table, in
  * both the sequential-reference and batched form.
  *
  * {{{
  * BPE_DIR=target/testdata/sf10z BPE_MERGES=1000 BPE_MODE=batched \
  *   sbt 'runMain graft.tools.BpeProbe'
  * }}}
  *
  * BPE_MODE: `batched` (default), `seq`, or `both` (runs both and
  * cross-checks the learned lists are identical).
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
    val mode = sys.env.getOrElse("BPE_MODE", "batched")
    val maxBatch = sys.env.getOrElse("BPE_MAX_BATCH", "64").toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[bpe-probe] dir=$dir docs=${docs.count()} merges=$nMerges " +
      s"mode=$mode maxBatch=$maxBatch")

    val t0 = System.nanoTime()
    val words = Bpe.wordTable(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = words.count()
    println(f"[bpe-probe] word table: $vocab%d words, " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs (the one corpus pass)")

    def report(tag: String, wall: Double, merges: Seq[(Int, String, String)]): Unit = {
      println(f"[bpe-probe] $tag(${merges.size}) wall=$wall%.1fs " +
        f"(${wall / merges.size}%.3fs/merge, ${merges.size / wall * 3600}%.0f merges/hour, " +
        f"includes its own word-table pass)")
      merges.take(10).foreach { case (r, a, b) =>
        println(s"[bpe-probe]   merge $r: '$a' + '$b'") }
      if (merges.size > 10) println(s"[bpe-probe]   … ${merges.size - 10} more")
    }

    var seqList: Seq[(Int, String, String)] = Seq()
    if (mode == "seq" || mode == "both") {
      val t1 = System.nanoTime()
      seqList = Bpe.trainMerges(docs, "text", nMerges)
      report("trainMerges", (System.nanoTime() - t1) / 1e9, seqList)
    }
    var batList: Seq[(Int, String, String)] = Seq()
    if (mode == "batched" || mode == "both" || mode == "localvsbatched") {
      val t2 = System.nanoTime()
      batList = Bpe.trainMergesBatched(docs, "text", nMerges, maxBatch = maxBatch)
      val wall = (System.nanoTime() - t2) / 1e9
      report("trainMergesBatched", wall, batList)
      if (mode == "both") {
        val same = batList == seqList
        println(s"[bpe-probe] batched == sequential: $same")
        if (!same) {
          val d = batList.zip(seqList).indexWhere { case (x, y) => x != y }
          println(s"[bpe-probe] FIRST DIVERGENCE at rank $d: " +
            s"batched=${batList.lift(d)} seq=${seqList.lift(d)}")
          sys.exit(1)
        }
      }
    }
    if (mode == "local" || mode == "localvsbatched") {
      val t3 = System.nanoTime()
      val loc = Bpe.trainMergesLocal(docs, "text", nMerges)
      report("trainMergesLocal", (System.nanoTime() - t3) / 1e9, loc)
      if (mode == "localvsbatched") {
        val same = loc == batList
        println(s"[bpe-probe] local == batched: $same")
        if (!same) {
          val d = loc.zip(batList).indexWhere { case (x, y) => x != y }
          println(s"[bpe-probe] FIRST DIVERGENCE at rank $d: " +
            s"local=${loc.lift(d)} batched=${batList.lift(d)}")
          sys.exit(1)
        }
      }
    }
    words.unpersist()
    println("[bpe-probe] OK")
    spark.stop()
  }
}
