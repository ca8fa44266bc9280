package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for [[Dedup.editDistancePairs]] on the Zipf corpora.
  *
  * Two measurements, deliberately split:
  *
  *  1. THE CONTRACT DOMAIN — near-unique entity names (20 all-hash
  *     chars), substitution variants planted on doc_id % 9 and
  *     deletion variants on % 14, k = 2, at the 500k- and 5M-doc
  *     decades. Every segment key is hash-unique-ish, so candidates ≈
  *     planted pairs; the probe requires TOTAL planted recall and
  *     times the join.
  *  2. THE PATHOLOGICAL SHAPE, quantified at small scale — names whose
  *     suffix is the document's FIRST WORD. On a Zipf corpus the head
  *     word covers a few percent of all docs, so one (segment, i, len)
  *     key holds thousands of strings and the candidate set grows
  *     quadratically in that bucket (every candidate then REJECTED by
  *     levenshtein — pure waste). This is the documented domain
  *     exclusion: heavy shared affixes (Inc/LLC/head words) must be
  *     normalized away before an edit-distance join, or the pair
  *     search belongs to the shingle family. Measured, not argued.
  *
  * {{{
  * SPARK_GRAFT_CPUS=16 sbt 'runMain graft.tools.EditDistProbe'
  * }}}
  */
object EditDistProbe {
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

    def withVariants(base: org.apache.spark.sql.DataFrame) = {
      val sub = base.where(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(substring(col("nm"), 1, 4), lit("Z"),
            substring(col("nm"), 6, 100)).as("nm"))
      val del = base.where(col("doc_id") % 14 === 0)
        .select((col("doc_id") + 200000000L).as("doc_id"),
          concat(substring(col("nm"), 1, 6),
            substring(col("nm"), 8, 100)).as("nm"))
      (base.unionByName(sub).unionByName(del), sub.count() + del.count())
    }

    def run(label: String, names: org.apache.spark.sql.DataFrame,
        nPlanted: Long): Unit = {
      val n = names.count()
      val t0 = System.nanoTime()
      val (total, planted) = Dedup.editDistancePairs(names, "doc_id", "nm", 2)
        .agg(count(lit(1)),
          sum(when(col("j") - col("i") === 100000000L ||
            col("j") - col("i") === 200000000L, 1L).otherwise(0L)))
        .as[(Long, Long)].head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[editdist-probe] $label names=$n pairs=$total " +
        f"planted_found=$planted/$nPlanted wall=$secs%.1f s")
      if (nPlanted > 0) require(planted >= nPlanted,
        s"planted recall must be total: $planted < $nPlanted")
    }

    val hashName: Column = concat(
      substring(md5(col("text")), 1, 10), lit("-"),
      substring(md5(concat(col("text"), lit("x"))), 1, 9))

    for (dir <- Seq("target/testdata/sf10z", "target/testdata/sf100z")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val (names, planted) = withVariants(
        docs.select(col("doc_id"), hashName.as("nm")))
      run(s"contract-domain $dir", names, planted)
    }

    // pathological heavy-affix shape, quantified at 50k docs only
    val small = spark.read.parquet("target/testdata/sf10z/documents.parquet")
      .where(col("doc_id") % 10 === 0)
    val (badNames, badPlanted) = withVariants(small.select(col("doc_id"),
      concat(substring(md5(col("text")), 1, 12), lit("-"),
        substring(col("text"), 1, 8)).as("nm")))
    run("heavy-affix-50k (PATHOLOGICAL, documented exclusion)",
      badNames, badPlanted)
    spark.stop()
  }
}
