package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.Packing

/** Scale probe for the sequence-packing family: placement + bin fill
  * on a documents dir at several shard counts — nShards is the
  * parallelism knob (each shard is one running-sum window partition),
  * so a fixed small count is a reducer ceiling at corpus scale, and
  * this measures where it starts to bite and what widening it buys.
  *
  * {{{
  * PACK_DIR=target/testdata/sf100z sbt 'runMain graft.tools.PackingProbe'
  * }}}
  */
object PackingProbe {
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

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val shardCounts = sys.env.getOrElse("PACK_SHARDS", "16,256,4096")
      .split(",").map(_.trim.toInt).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    println(s"[pack-probe] dir=$dir docs=$nDocs")

    def time(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    def lowerMedian(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    shardCounts.foreach { n =>
      val placeTimes = (1 to runs).map { _ =>
        time {
          Packing.packPlacement(docs, "doc_id", T.tokenCount(col("text")),
              budget = 2048, nShards = n)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val binTimes = (1 to runs).map { _ =>
        time {
          Packing.binFill(
            Packing.packPlacement(docs, "doc_id", T.tokenCount(col("text")),
              budget = 2048, nShards = n), budget = 2048)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"""{"shards":$n,"place_s":${lowerMedian(placeTimes)}%.2f,""" +
        f""""bins_s":${lowerMedian(binTimes)}%.2f,""" +
        f""""place_raw":[${placeTimes.map(t => f"$t%.2f").mkString(",")}],""" +
        f""""bins_raw":[${binTimes.map(t => f"$t%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
