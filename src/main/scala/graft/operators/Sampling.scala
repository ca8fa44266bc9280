package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.Md5Prefix60

/** Deterministic, engine-portable sampling and split assignment — the
  * bread-and-butter of training-data pipelines at scale. Everything
  * keys off the portable md5-prefix hash ([[Md5Prefix60]]), so:
  *  - assignment is a pure per-row map (no shuffle, no state, no rand()
  *    — replays and retries agree, and the same doc lands in the same
  *    split on any engine or cluster size);
  *  - the DuckDB oracle reproduces every bucket exactly.
  */
object Sampling {

  /** Hash bucket in [0, nBuckets) from the string form of a key. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    pmod(Md5Prefix60(key.cast("string")), lit(nBuckets.toLong))

  /** Score-proportional deterministic keep — the CCNet-style "sample
    * by quality" step: a row with per-mille score p survives iff its
    * key's hash bucket of 1000 falls below p, so the corpus keeps each
    * row with probability p/1000 WITHOUT rand() — replay-identical,
    * engine-portable, and the kept set of a higher threshold is a
    * superset of a lower one (same bucket, larger cut). Callers derive
    * `perMille` from any deterministic integer-exact signal (e.g.
    * ⌊1000·n_dict/n_tokens⌋); values are clamped to [0, 1000].
    */
  def scoreKeep(perMille: Column, key: Column): Column =
    hashBucket(key, 1000) <
      greatest(lit(0L), least(lit(1000L), perMille.cast("long")))

  /** Train/val/test assignment by hash percentile: bucket < trainPct →
    * "train", < trainPct+valPct → "val", else "test". Percentages are
    * out of 100.
    */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split ($trainPct/$valPct)")
    val b = hashBucket(key, 100)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Deterministic Bernoulli-style sample: keep rows whose hash bucket
    * (out of `outOf`) falls below `keep` — a stable `keep/outOf`
    * fraction, unlike `rand()`-based sampling which changes on every
    * retry/replay.
    */
  def deterministicKeep(key: Column, keep: Int, outOf: Int = 1000): Column =
    hashBucket(key, outOf) < keep

  /** Deterministic source-mixing repeat count — the "upsample wiki
    * 2.3×, downsample crawl 0.4×" step of corpus curation, without
    * rand(): a row with stratum weight w (per-mille, so 2300 = 2.3×)
    * is emitted ⌊w/1000⌋ times, plus one more iff its hash bucket of
    * 1000 falls below w mod 1000. The stratum therefore lands at
    * EXACTLY its weight in expectation, every copy decision is a pure
    * function of (stratum, key) — replays, retries, and engines agree —
    * and weight 0 drops the stratum. Callers materialize the copies
    * with `explode(sequence(0, copies - 1))` guarded by `copies > 0`
    * (see the `x_mix_weights` query); map-only until that explode,
    * which multiplies rows by the mix factor and nothing else.
    */
  def mixCopies(strata: Column, key: Column,
      perMille: Map[String, Int], defaultPerMille: Int = 1000): Column = {
    require((perMille.values ++ Seq(defaultPerMille)).forall(_ >= 0),
      "mix weights must be non-negative")
    val w = perMille.foldLeft(lit(defaultPerMille)) { case (acc, (v, p)) =>
      when(strata === v, p).otherwise(acc)
    }.cast("long")
    val whole = floor(w.cast("double") / 1000d).cast("long")
    whole + when(hashBucket(key, 1000) < pmod(w, lit(1000L)), 1L).otherwise(0L)
  }

  /** Stratified deterministic sampling — the "downsample the
    * overrepresented language/source" step of corpus balancing. Each
    * stratum value gets its own keep-fraction (per-mille, so the
    * when-chain stays integer-exact and oracle-portable); unlisted
    * strata keep `defaultPerMille`. Still a pure per-row map: no
    * shuffle, no rand(), replay-identical, and `sampleBy`-equivalent
    * except deterministic.
    */
  def stratifiedKeep(strata: Column, key: Column,
      perMille: Map[String, Int], defaultPerMille: Int = 1000): Column = {
    require((perMille.values ++ Seq(defaultPerMille)).forall(p => p >= 0 && p <= 1000),
      "per-mille fractions must be in [0, 1000]")
    val b = hashBucket(key, 1000)
    val threshold = perMille.foldLeft(lit(defaultPerMille)) { case (acc, (v, p)) =>
      when(strata === v, p).otherwise(acc)
    }
    b < threshold
  }

  /** Per-stratum cap: rank rows within each stratum by
    * (`quality` DESC, `tiebreak` ASC) and keep the top `n` — the
    * "at most N docs per domain/source" curation step that stops a
    * single mega-crawl domain from dominating the mix. Adds the rank
    * as `cap_rank`. Deterministic given a total tiebreak (pass the
    * doc id).
    *
    * Scale shape: the rank-≤-n filter plans as a window GROUP LIMIT
    * (Spark's `WindowGroupLimit` — a per-partition top-n pre-filter
    * BEFORE the stratum exchange and again under the final window
    * sort), so a skewed stratum (one domain = 30% of the crawl) ships
    * at most n rows per upstream task instead of its whole corpus
    * slice, and no full-stratum sort materializes. Pinned in
    * PlanAuditSpec.
    */
  def capPerStratum(df: org.apache.spark.sql.DataFrame, strata: Column,
      quality: Column, tiebreak: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"n=$n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(quality.desc, tiebreak.asc)
    df.withColumn("cap_rank", row_number().over(w))
      .where(col("cap_rank") <= n)
  }
}
