package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Attribution probe for the line-quality family at a scale decade:
  * how much of `x_text_gopher` / `x_text_c4` wall is the OPERATOR
  * (LineStats/TokenStats kernels, c4 HOF filter on already-lined
  * text) vs the oracle-harness' planted lined-rendition derivation
  * (tokenChunks + transform + array_join, needed only because the
  * synthetic corpus has no newlines — real corpora arrive lined).
  *
  * {{{
  * QP_DIR=target/testdata/sf100z sbt 'runMain graft.tools.QualityProbe'
  * }}}
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("QP_DIR", "target/testdata/sf100z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[quality-probe] dir=$dir docs=${docs.count()}")

    def timed(what: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[quality-probe] $what run$r wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    }

    // the lined rendition alone (harness cost)
    val lines = transform(T.tokenChunks(col("text"), 8, 8),
      c => array_join(c.getField("toks"), " "))
    timed("rendition only")(
      docs.select(col("doc_id"), array_join(lines, "\n").as("t2")))

    // operators on RAW text (what a lined real corpus would pay)
    timed("LineStats+TokenStats on raw text")(
      docs.select(col("doc_id"),
        graft.expressions.LineStats.stats(col("text")).as("l"),
        graft.expressions.TokenStats.stats(col("text"), T.EnWords).as("t")))
    timed("c4Clean on raw text")(
      docs.select(col("doc_id"), T.c4Clean(col("text")).as("c")))

    // operators on the derived lined text (the query's full bill)
    val lined = docs.withColumn("__t2", array_join(lines, "\n"))
    timed("LineStats+TokenStats on rendition")(
      lined.select(col("doc_id"),
        graft.expressions.LineStats.stats(col("__t2")).as("l"),
        graft.expressions.TokenStats.stats(col("__t2"), T.EnWords).as("t")))
    timed("c4Clean on rendition")(
      lined.select(col("doc_id"), T.c4Clean(col("__t2")).as("c")))

    spark.stop()
  }
}
