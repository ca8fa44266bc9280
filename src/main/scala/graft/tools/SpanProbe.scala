package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for [[graft.operators.Dedup.sharedSpanPairs]]: wall,
  * surviving (df-capped) span rows, and output pairs across df caps
  * and corpus decades — the evidence that the cap, not luck, is what
  * keeps the span self-join linear.
  *
  * {{{
  * PACK_DIR=target/testdata/sf100z sbt 'runMain graft.tools.SpanProbe'
  * }}}
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // span tables hit hundreds of millions of rows at sf100; wider
    // shuffles keep per-partition sort buffers inside executor memory
    val parts = sys.env.getOrElse("SPAN_PARTS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val caps = sys.env.getOrElse("SPAN_CAPS", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val n = sys.env.getOrElse("SPAN_N", "8").toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()

    // plan facts for ALL caps in one uncached aggregation pass —
    // caching the df table (hundreds of millions of rows at sf100)
    // starves the window/join stages of execution memory
    val spans = docs.select(col("doc_id"),
      explode(graft.expressions.WordShingleHashes64(
        graft.functions.TextFunctions.tokens(col("text")), n)).as("__h"))
    val dfAgg = spans.groupBy("__h").agg(count(lit(1)).as("df"))
    val factCols = Seq(count(lit(1)).as("distinct_spans")) ++
      caps.flatMap { cap =>
        Seq(
          sum(when(col("df") <= cap, expr("df * (df - 1) / 2"))
            .otherwise(lit(0L))).as(s"cand_$cap"),
          sum(when(col("df") > cap, 1L).otherwise(0L)).as(s"excl_$cap"))
      }
    val facts = dfAgg.agg(factCols.head, factCols.tail: _*).head()
    println(s"[span-probe] dir=$dir docs=$nDocs n=$n " +
      s"distinct_spans=${facts.getAs[Long]("distinct_spans")}")

    caps.foreach { cap =>
      val candMass = facts.getAs[Double](s"cand_$cap").toLong
      val excluded = facts.getAs[Long](s"excl_$cap")
      val t0 = System.nanoTime()
      val pairs = Dedup.sharedSpanPairs(docs, "doc_id", "text", n, cap)
      pairs.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val nPairs = pairs.count()
      println(f"""{"cap":$cap,"cand_mass":$candMass,"excluded_spans":$excluded,"pairs":$nPairs,"wall_s":$wall%.2f}""")
    }
    spark.stop()
  }
}
