package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** In-flight dedup gating for streaming document ingest — the "is this
  * incoming doc already in (or nearly in) the corpus" pass a
  * continuously-fed training pipeline runs before accepting a crawl
  * batch. Composes with [[LakeIngest]]: gate the stream, then ingest
  * the survivors.
  *
  * Everything here is STATELESS per micro-batch — stream-static joins
  * and map-side predicates only, no streaming aggregation, no state
  * store, no watermark requirement (compose
  * [[EventStreams.dedupWithinWatermark]] upstream for within-stream
  * exact dups). That is the scale contract: state-store size can never
  * become the bottleneck because there is no state; the static corpus
  * index is an ordinary DataFrame (parquet/lake-backed at scale) that
  * each micro-batch joins against — broadcast when it fits,
  * shuffle-partitioned when it does not.
  */
object StreamingDedup {

  /** Exact gate: incoming docs whose content hash is NOT already in
    * `corpus` (stream-static LEFT ANTI join on md5 — supported with
    * the static side on the right). Byte-identical re-crawls drop;
    * everything else passes through unchanged.
    *
    * NULL text is deliberately NOT deduplicated: `md5(NULL)` is NULL
    * and the join condition uses `===`, so a null-text row never
    * matches the corpus (even a corpus null-text row) and always
    * passes the gate. The gate dedups CONTENT, and null is the absence
    * of content, not a value of it — collapsing all null-text docs
    * into one would silently drop distinct (id, metadata) rows whose
    * text merely failed extraction. Callers that do want null-collapse
    * semantics should filter or `coalesce` the text column upstream.
    */
  def notInCorpus(incoming: DataFrame, corpus: DataFrame,
      textCol: String): DataFrame =
    incoming.join(
      corpus.select(md5(col(textCol)).as("__corpus_md5")).distinct(),
      md5(incoming(textCol)) === col("__corpus_md5"), "left_anti")

  /** Static near-dup index over the corpus: one row per (corpus_id,
    * band), carrying the doc's full band array and hashed shingle set
    * for the pair-dedup predicate and the exact-Jaccard confirm in
    * [[nearDupFlags]]. Signed with the SAME fused per-row kernel the
    * streaming side uses ([[Dedup.rowBandArray]] → `MinHashBands`, a
    * single map-only array scan — no signature groupBy, no
    * sigs-to-sets join), so index and stream keys are identical by
    * construction; the kernel's parity with the min-over-explode
    * batch derivation is pinned in `MinHashBandsSpec`. A contentless
    * (null-text) corpus doc now gets signature-less keys (`"b"`)
    * instead of vanishing from the index — it can collide only with
    * another contentless doc, and the confirm drops that pair: a null
    * `__cset`/`__dset` null-propagates through `SortedArrayJaccard`,
    * and the `>= threshold` filter rejects a null score (an
    * empty-but-non-null set pair scores 0.0 and is rejected the same
    * way), so flag output is unchanged. Materialize this to
    * the lake and refresh on corpus compaction; a stream reads it as
    * plain static input. MIGRATION: indexes materialized before the
    * int32 shingle-set change carry `array<bigint>` `__cset`, and a
    * new stream's `array<int>` `__dset` fails `SortedArrayJaccard`'s
    * both-int-or-both-long type check at analysis time (loud, not
    * wrong) — rebuild such indexes, or
    * `cast(__cset as array<int>)` on read (lossless: every stored
    * hash is < 2³⁰).
    */
  def corpusIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 5, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
        Dedup.hashedShingleSet(col(textCol), n).as("__cset"))
      .withColumn("__cbands", Dedup.rowBandArray(col("__cset"), k, rowsPerBand))
      .select(col("corpus_id"), col("__cset"), col("__cbands"),
        explode(col("__cbands")).as("band"))

  /** Near-dup flags for a streaming batch of documents against a
    * [[corpusIndex]]: emits ONE row per (incoming doc, corpus doc)
    * pair with Jaccard ≥ `threshold`. Downstream drops flagged docs
    * with a left-anti join on `doc_id` (or keeps the pairs as a
    * provenance log).
    *
    * Shape, all stateless: (1) map-only per-row shingle set + band
    * keys ([[Dedup.rowBandArray]] — no groupBy, hence streamable);
    * (2) stream-static equi-join on the band key generates candidates
    * from hash buckets, never a cross product; (3) a pair sharing
    * SEVERAL bands would surface once per band, so keep only the row
    * whose joined band is the MINIMUM of the pair's shared bands — a
    * plain predicate over the two band arrays already in hand, which
    * dedups pairs exactly without `distinct()` (a streaming
    * aggregation this operator deliberately has none of); (4) exact
    * Jaccard on the two shingle sets confirms, so band collisions can
    * cost work but never a wrong flag.
    *
    * Scale shape of the stream-static join (measured in
    * `DedupGateSoak` at a 500k-doc / 2M-row index): the planner
    * broadcasts the BOUNDED side — the exploded micro-batch — and
    * streams the index through the probe, so index size is a
    * per-batch scan bill, never a driver/executor memory bill. At
    * 100 TB the levers are amortizing that scan with larger triggers,
    * and cutting it by bucketing the materialized index by band key
    * so the parquet reader prunes to the micro-batch's buckets.
    */
  def nearDupFlags(incoming: DataFrame, index: DataFrame,
      idCol: String, textCol: String, n: Int = 5, k: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.7): DataFrame = {
    // an index built with different (k, rowsPerBand) produces disjoint
    // band keys and the join silently matches NOTHING — fail loudly
    // instead. One-row peek at the static side, at plan-construction
    // time (the index is parquet-backed at scale; head of one row is a
    // single-split read).
    index.select(size(col("__cbands")).as("w")).head(1).foreach { r =>
      require(r.getInt(0) == k / rowsPerBand,
        s"index has ${r.getInt(0)} bands/doc but the probe expects " +
          s"${k / rowsPerBand} (k=$k, rowsPerBand=$rowsPerBand) — " +
          "rebuild the index or match its parameters")
    }
    joinFlags(bandedIncoming(incoming, idCol, textCol, n, k, rowsPerBand),
      index, threshold)
  }

  /** The incoming side of the gate: per-row shingle set + band keys,
    * one exploded row per (doc, band) — map-only, hence streamable.
    */
  private def bandedIncoming(incoming: DataFrame, idCol: String,
      textCol: String, n: Int, k: Int, rowsPerBand: Int): DataFrame =
    incoming
      .select(col(idCol).as("doc_id"),
        Dedup.hashedShingleSet(col(textCol), n).as("__dset"))
      .withColumn("__dbands", Dedup.rowBandArray(col("__dset"), k, rowsPerBand))
      .select(col("doc_id"), col("__dset"), col("__dbands"),
        explode(col("__dbands")).as("band"))

  /** The join core shared by [[nearDupFlags]] and
    * [[nearDupFlagsPruned]]: band-bucket equi-join, min-shared-band
    * pair dedup, exact-Jaccard confirm.
    */
  private def joinFlags(in: DataFrame, index: DataFrame,
      threshold: Double): DataFrame =
    in.join(index, Seq("band"))
      .where(col("band") ===
        array_min(array_intersect(col("__dbands"), col("__cbands"))))
      .withColumn("jaccard",
        graft.expressions.SortedArrayJaccard(col("__dset"), col("__cset")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("corpus_id"), col("jaccard"))

  /** Name of the sidecar file [[writeBucketedIndex]] drops next to the
    * parquet dirs, holding the bucket count — the read side MUST hash
    * with the same modulus or the pruning silently drops true matches.
    */
  private val BucketSidecar = "_graft_band_buckets"

  private def bucketOf(band: Column, nBuckets: Int): Column =
    pmod(xxhash64(band), lit(nBuckets.toLong))

  /** Materialize a [[corpusIndex]] to the lake partitioned by a
    * band-hash bucket — the scan-cutting lever for the streaming
    * gate: a micro-batch's band keys hash into a bounded set of
    * buckets, so [[nearDupFlagsPruned]] reads only those partitions
    * instead of the whole index. The count is recorded in a sidecar
    * so the read side can never hash with a different modulus.
    *
    * MEASURED ECONOMICS (GateScanBench, zipf sf10 corpus — 500k docs,
    * 2M-row index; `bench_evidence/r9_gate_ab_sf10z_*`): this layout
    * rarely pays, for two compounding reasons. (1) Bucket saturation:
    * at k/rowsPerBand = 4 uniformly-hashed band keys per doc, a
    * 32-doc batch already touches 56 of 64 buckets (118 of 1024), so
    * meaningful pruning needs batch ≲ nBuckets/40 docs — trickle
    * triggers only. (2) Compression: band-hash clustering destroys
    * the corpus-order adjacency parquet dictionaries exploit — the
    * same 2M rows are 82 MB corpus-ordered, 159 MB at 64 buckets,
    * 581 MB at 1024 — so at batch=32/nBuckets=1024 the "pruned"
    * 67 MB read already exceeds the entire plain index. Use this
    * only for trickle triggers (≤ tens of docs) against
    * remote-storage indexes big enough that listing+fetch dominates;
    * everywhere else [[nearDupFlags]]'s full scan (a sub-second
    * broadcast-batch join at this index size) wins outright.
    */
  def writeBucketedIndex(index: DataFrame, path: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    // repartition on the partition column before partitionBy, or every
    // write task emits a file into every bucket dir — tasks × nBuckets
    // small files (measured 1024 files for a 2M-row index at 16 tasks,
    // GateProbe2; 640k files at a 1000-executor write). One shuffle at
    // index-build time buys one chunky file per bucket.
    index.withColumn("__bb", bucketOf(col("band"), nBuckets))
      .repartition(nBuckets, col("__bb"))
      .write.mode("overwrite").partitionBy("__bb").parquet(path)
    val spark = index.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, BucketSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /** [[nearDupFlags]] against a [[writeBucketedIndex]] lake index,
    * reading ONLY the band-hash partitions the batch can touch — for
    * use inside `foreachBatch`, where the micro-batch is a plain
    * DataFrame and a bounded driver action is legal. Shape: (1) the
    * banded incoming frame is pinned once (eager localCheckpoint —
    * the batch is trigger-bounded); (2) its distinct band buckets
    * are collected (≤ nBuckets rows); (3) the index is read
    * `WHERE __bb IN (...)` — a literal filter on the partition
    * column, so the parquet reader prunes at file-listing time and
    * the per-batch bill drops from O(index) to
    * O(index · buckets_hit / nBuckets); (4) the shared join core
    * runs unchanged, so output ≡ [[nearDupFlags]] by construction
    * (pinned in `StreamingDedupSpec`). Wrong-modulus reads are
    * impossible: the bucket count comes from the sidecar the writer
    * dropped.
    *
    * KNOW WHEN NOT TO USE IT: the round-9 A/B
    * (`bench_evidence/r9_gate_ab_sf10z_*`, realistic zipf corpus)
    * measured this path SLOWER than [[nearDupFlags]] at every local
    * configuration — bucket saturation caps the prune ratio above
    * trickle batch sizes, the clustered layout compresses 2–7× worse
    * (see [[writeBucketedIndex]]), and the fixed per-batch costs
    * (sidecar read, localCheckpoint, distinct-collect, partition
    * listing) exceed the sub-second full scan. It exists for the one
    * regime the full scan can't serve: trickle triggers against a
    * remote-storage index orders of magnitude larger than a batch.
    */
  def nearDupFlagsPruned(batch: DataFrame, indexPath: String,
      idCol: String, textCol: String, n: Int = 5, k: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.7): DataFrame = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(indexPath, BucketSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nBuckets = {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64)
        var r = in.read(chunk)
        while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8").trim.toInt
      } finally in.close()
    }
    val index = spark.read.parquet(indexPath)
    index.select(size(col("__cbands")).as("w")).head(1).foreach { r =>
      require(r.getInt(0) == k / rowsPerBand,
        s"index has ${r.getInt(0)} bands/doc but the probe expects " +
          s"${k / rowsPerBand} (k=$k, rowsPerBand=$rowsPerBand) — " +
          "rebuild the index or match its parameters")
    }
    val in = bandedIncoming(batch, idCol, textCol, n, k, rowsPerBand)
      .localCheckpoint()
    val buckets = in.select(bucketOf(col("band"), nBuckets).as("__bb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    joinFlags(in, index.where(col("__bb").isin(buckets: _*)), threshold)
  }
}
