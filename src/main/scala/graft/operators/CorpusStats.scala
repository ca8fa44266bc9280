package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-relative document statistics — quality signals that need the
  * whole corpus, unlike the per-row scores in
  * [[graft.functions.TextFunctions]]. The first member is mean token
  * document-frequency: documents made of tokens few other documents
  * contain (OCR noise, codes, exotic boilerplate) score low; documents
  * of common words score high. The CCNet-style perplexity filter uses
  * the same shape (corpus model → per-doc score); df is the
  * integer-exact variant — every aggregate is a BIGINT sum, so results
  * are order-independent and engine-portable, where a floating log-sum
  * would hash-differ across partitionings.
  */
object CorpusStats {

  /** Per-document distinct-token count and mean document frequency of
    * those tokens against the corpus itself.
    *
    * Shape: explode DISTINCT tokens per doc (dedup before the explode
    * keeps a token spam-repeated inside one doc from inflating both
    * its df and the doc's own score), aggregate token → df (one
    * shuffle, map-side partial counts), join back on token (the df
    * table is vocab-sized — broadcast when it fits, shuffle join when
    * it does not; Spark's planner picks), and re-aggregate per doc
    * (second shuffle). Token-less docs (empty/null text) survive the
    * final left join with n_distinct_toks = 0 and a NULL mean.
    *
    * The input is scanned twice — once for the token explode, once for
    * the id-only left join that re-admits token-less docs. Column
    * pruning keeps the second scan to the id column; cache a projected
    * `docs` upstream if the source re-read is expensive.
    *
    * @return ONLY (idCol, n_distinct_toks, df_sum, mean_token_df) —
    *         other input columns are dropped; join the result back on
    *         idCol to re-attach them.
    */
  def meanTokenDf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
        explode(array_distinct(T.tokens(col(textCol)))).as("__tok"))
    val dfs = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val perDoc = toks.join(dfs, "__tok")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_distinct_toks"), sum(col("__df")).as("df_sum"))
    docs.select(col(idCol))
      .join(perDoc, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_distinct_toks"), lit(0L)).as("n_distinct_toks"),
        col("df_sum"),
        round(col("df_sum").cast("double") /
          col("n_distinct_toks").cast("double"), 6).as("mean_token_df"))
  }
}
