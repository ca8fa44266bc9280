package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Stage-attributed cost of the trained language-ID query shape — the
  * round-12 bench flagged `x_langid_trained` as the heaviest query on
  * the surface, and this separates training passes, the merge, and
  * the classify join/window so the bill is attributable.
  *
  * {{{ sbt 'runMain graft.tools.LangIdCostProbe' }}}
  */
object LangIdCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("CORPUS_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lg] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println(s"[lg] docs=${docs.count()}")
    t("langProfiles x1 (count)") {
      CorpusStats.langProfiles(docs, "lang", "text").count() }
    t("3-partial merge (count)") {
      CorpusStats.mergeLangProfiles((0 to 2).map(r =>
        CorpusStats.langProfiles(
          docs.where(col("doc_id") % 3 === r), "lang", "text"))).count()
    }
    // materialized, per langClassifyWith's contract (the model is
    // referenced twice; a lazy plan re-trains per reference)
    val model = CorpusStats.mergeLangProfiles((0 to 2).map(r =>
      CorpusStats.langProfiles(
        docs.where(col("doc_id") % 3 === r), "lang", "text")))
      .localCheckpoint(true)
    t("classifyWith cold (collect)") {
      CorpusStats.langClassifyWith(docs, "doc_id", "text", model)
        .orderBy("doc_id").collect()
    }
    t("classifyWith warm (collect)") {
      CorpusStats.langClassifyWith(docs, "doc_id", "text", model)
        .orderBy("doc_id").collect()
    }
    t("grams explode alone (count)") {
      docs.select(split(col("text"), "").as("__cs"),
          length(col("text")).as("__len"))
        .select(explode(transform(sequence(lit(1), col("__len") - 2),
          i => concat(element_at(col("__cs"), i),
            element_at(col("__cs"), i + 1),
            element_at(col("__cs"), i + 2)))).as("g"))
        .count()
    }
    spark.stop()
  }
}
