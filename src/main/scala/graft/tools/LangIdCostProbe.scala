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

    // ALTERNATE classify: pre-aggregate (doc, gram) occurrence counts
    // before the model join — trades one extra shuffle for a join
    // probe (and a (doc, lang) aggregate input) cut by the per-doc
    // gram repetition factor. Candidate for round 13; measured here
    // first, output checksum-compared against the shipped path.
    import org.apache.spark.sql.expressions.Window
    def classifyPreAgg(): Array[org.apache.spark.sql.Row] = {
      val n = 3
      val grams = docs.select(col("doc_id").as("__id"), col("text").as("__t"))
        .where(length(col("__t")) >= n)
        .select(col("__id"), split(col("__t"), "").as("__cs"),
          length(col("__t")).as("__len"))
        .select(col("__id"), explode(transform(
          sequence(lit(1), col("__len") - 2),
          i => concat(element_at(col("__cs"), i),
            element_at(col("__cs"), i + 1),
            element_at(col("__cs"), i + 2)))).as("gram"))
      val ng = docs.select(col("doc_id").as("__id"),
        when(length(col("text")) >= n,
          (length(col("text")) - (n - 1)).cast("long"))
          .otherwise(lit(0L)).as("n_grams"))
      val tot = model.groupBy(col("lang")).agg(sum(col("n")).as("__total"))
      val hits = grams.groupBy(col("__id"), col("gram"))
        .agg(count(lit(1)).as("__c"))
        .join(model, Seq("gram"))
        .groupBy(col("__id"), col("lang"))
        .agg(sum(col("__c") * col("n")).as("__h"))
      val w = Window.partitionBy(col("__id"))
        .orderBy(col("__score").desc, col("lang"))
      val best = hits.join(tot, Seq("lang"))
        .withColumn("__score",
          col("__h").cast("double") / col("__total").cast("double"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__id"), col("lang"), col("__score"))
      val perDoc = ng.join(best, Seq("__id"), "left")
      docs.select(col("doc_id"))
        .join(perDoc, col("doc_id") === col("__id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("lang"), lit("und")).as("lang_pred"),
          round(col("__score"), 6).as("lang_score"))
        .orderBy("doc_id").collect()
    }
    val alt = t("ALTERNATE pre-agg classify cold (collect)")(classifyPreAgg())
    t("ALTERNATE pre-agg classify warm (collect)")(classifyPreAgg())

    // ALTERNATE 2, MODEL-PIVOT (round-13 measurement of the carried
    // round-12 candidate): pivot the model to one row per gram with
    // one count column per language, so the corpus-gram join emits ONE
    // row per hit instead of one per (hit × matching language), and
    // the per-doc aggregate sums |langs| columns instead of shuffling
    // |langs|× the row mass. Integer sums are order-independent, so
    // the scores are bit-identical to the shipped path.
    def classifyPivot(): Array[org.apache.spark.sql.Row] = {
      val n = 3
      import spark.implicits._
      val langs = model.select(col("lang")).distinct()
        .orderBy("lang").as[String].collect().toSeq // model-bounded
      val totals = model.groupBy(col("lang")).agg(sum(col("n")).as("t"))
        .as[(String, Long)].collect().toMap // |langs| rows
      val piv = model.groupBy(col("gram"))
        .pivot("lang", langs).sum("n").na.fill(0L)
      val grams = docs.select(col("doc_id").as("__id"), col("text").as("__t"))
        .where(length(col("__t")) >= n)
        .select(col("__id"), split(col("__t"), "").as("__cs"),
          length(col("__t")).as("__len"))
        .select(col("__id"), explode(transform(
          sequence(lit(1), col("__len") - 2),
          i => concat(element_at(col("__cs"), i),
            element_at(col("__cs"), i + 1),
            element_at(col("__cs"), i + 2)))).as("gram"))
      val ng = docs.select(col("doc_id").as("__id"),
        when(length(col("text")) >= n,
          (length(col("text")) - (n - 1)).cast("long"))
          .otherwise(lit(0L)).as("n_grams"))
      val sums = grams.join(piv, Seq("gram"))
        .groupBy(col("__id"))
        .agg(sum(col(s"`${langs.head}`")).as(s"__h_0"),
          langs.tail.zipWithIndex.map { case (l, i) =>
            sum(col(s"`$l`")).as(s"__h_${i + 1}") }: _*)
      val scored = langs.zipWithIndex.foldLeft(sums) { case (df, (l, i)) =>
        df.withColumn(s"__s_$i",
          col(s"__h_$i").cast("double") / lit(totals(l)).cast("double"))
      }
      val arr = array(langs.indices.map(i =>
        struct(col(s"__s_$i").as("s"), lit(langs(i)).as("lang"))): _*)
      val cmp = (a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =>
        when(a.getField("s") > b.getField("s"), -1)
          .when(a.getField("s") < b.getField("s"), 1)
          .when(a.getField("lang") < b.getField("lang"), -1)
          .when(a.getField("lang") > b.getField("lang"), 1)
          .otherwise(0)
      val best = scored.withColumn("__best",
          element_at(array_sort(arr, cmp), 1))
        .select(col("__id"), col("__best.lang").as("lang"),
          col("__best.s").as("__score"))
      val perDoc = ng.join(best, Seq("__id"), "left")
      docs.select(col("doc_id"))
        .join(perDoc, col("doc_id") === col("__id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("lang"), lit("und")).as("lang_pred"),
          round(col("__score"), 6).as("lang_score"))
        .orderBy("doc_id").collect()
    }
    val piv = t("ALTERNATE 2 model-pivot classify cold (collect)")(classifyPivot())
    t("ALTERNATE 2 model-pivot classify warm (collect)")(classifyPivot())

    val shipped = CorpusStats.langClassifyWith(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    println(s"[lg] alternate == shipped: ${alt.toSeq == shipped.toSeq}")
    println(s"[lg] model-pivot == shipped: ${piv.toSeq == shipped.toSeq}")
    spark.stop()
  }
}
