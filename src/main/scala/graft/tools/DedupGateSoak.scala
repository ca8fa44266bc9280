package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** End-to-end soak of the streaming corpus dedup gate
  * ([[graft.streaming.StreamingDedup]]) across an INDEX REFRESH — the
  * operational cadence the unit tests can't reach: a file-based doc
  * stream is gated against a static corpus index, the queries are
  * stopped, the corpus is extended with the survivors ingested so far,
  * the index is rebuilt, and the SAME queries resume from their
  * checkpoints against the new index.
  *
  * {{{
  * sbt 'runMain graft.tools.DedupGateSoak'
  * }}}
  *
  * Feed pattern (deterministic, ids disjoint from the corpus):
  * value%3==0 → VERBATIM copy of a corpus doc; %3==1 → near-dup of a
  * corpus doc (one appended token, Jaccard ≈ 0.89 at 5-gram shingles);
  * %3==2 → fresh text (every shingle window carries a value-unique
  * token, so fresh docs can never collide with anything). Phase 2
  * additionally replays phase-1 FRESH docs verbatim — dup only
  * against the REFRESHED index.
  *
  * Checked at the end, against batch-computed ground truth:
  *  1. exact gate: survivors ≡ docs whose content hash was absent
  *     from the index version their batch was gated by — phase-1
  *     fresh docs pass in phase 1, their phase-2 replays drop;
  *  2. near-dup flags ≡ the batch MinHash pipeline's verdicts per
  *     phase (verbatim + near-dups flagged, fresh never), exactly
  *     once per (doc, corpus) pair — the min-shared-band dedup under
  *     real micro-batch timing;
  *  3. exactly-once across the restart: no survivor or flag row is
  *     duplicated or lost (file-sink log + checkpoint recovery with a
  *     CHANGED static side — the stream-static join must not have
  *     smuggled state across the restart).
  *
  * Prints one JSON line; exits non-zero on any violation.
  */
object DedupGateSoak {

  private def corpusText(i: Long): String =
    s"corpus document number $i alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def nearText(i: Long): String = corpusText(i) + " lambda"
  private def freshText(v: Long): String =
    s"fresh u$v document u$v with unique u$v content u$v run u$v more u$v filler u$v tokens u$v"

  private def incomingText(v: Long, nCorpus: Long): String = (v % 3) match {
    case 0 => corpusText(v % nCorpus)
    case 1 => nearText(v % nCorpus)
    case _ => freshText(v)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-gate-soak").toString
    val landing = s"$dir/landing"
    val corpusPath = s"$dir/corpus"
    val survivorsOut = s"$dir/survivors"
    val flagsOut = s"$dir/flags"
    val ck1 = s"$dir/ck-survivors"
    val ck2 = s"$dir/ck-flags"
    new java.io.File(landing).mkdirs()

    // SOAK_CORPUS scales the static index side (default 100 docs; set
    // 500000 for the sf10-scale soak where the ~2M-row index stops
    // being an automatic broadcast and the stream-static band join
    // hands off to a shuffle strategy — the plan actually chosen is
    // printed after phase 1, from the last micro-batch's execution).
    val nCorpus = sys.env.getOrElse("SOAK_CORPUS", "100").toLong
    def writeCorpus(extra: DataFrame): Unit = {
      val base = spark.range(nCorpus)
        .select(col("id").as("doc_id"),
          udf(corpusText _).apply(col("id")).as("text"))
      base.unionByName(extra).write.mode("overwrite").parquet(corpusPath)
    }
    writeCorpus(spark.emptyDataset[(Long, String)].toDF("doc_id", "text"))

    def corpus = spark.read.parquet(corpusPath)
    def startQueries(): (org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.streaming.StreamingQuery) = {
      val incoming = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(landing)
      val index = StreamingDedup.corpusIndex(corpus, "doc_id", "text")
      val survivors = StreamingDedup.notInCorpus(incoming, corpus, "text")
      val flags = StreamingDedup.nearDupFlags(incoming, index, "doc_id", "text")
      (survivors.writeStream.format("parquet")
        .option("path", survivorsOut).option("checkpointLocation", ck1)
        .start(),
        flags.writeStream.format("parquet")
          .option("path", flagsOut).option("checkpointLocation", ck2)
          .start())
    }

    def feed(vals: Seq[Long]): Unit = {
      vals.map(v => (10000L + v, incomingText(v, nCorpus)))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(landing)
    }
    def drain(qs: org.apache.spark.sql.streaming.StreamingQuery*): Unit =
      qs.foreach { q => q.processAllAvailable() }

    // ---- phase 1: gate 0..299 against the base corpus ----------------
    var (q1, q2) = startQueries()
    val phase1 = (0L until 300L)
    phase1.grouped(100).foreach(g => { feed(g); drain(q1, q2) })
    // capture the flag query's micro-batch physical plan: which join
    // strategy did the stream-static band join actually get at this
    // index size? (broadcast at the 100-doc default; at SOAK_CORPUS=
    // 500000 the static side exceeds the autoBroadcast threshold and
    // the planner must hand off — the soak's correctness checks then
    // prove the gate's semantics survive that handoff)
    val planOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(planOut)) { q2.explain() }
    val joinLines = planOut.toString.linesIterator
      .filter(l => l.contains("Join") && !l.contains("ReusedExchange"))
      .map(_.trim.take(160)).toSeq.distinct
    joinLines.foreach(l => println(s"[soak] flag-join plan: $l"))
    q1.stop(); q2.stop()

    // ---- refresh: fold phase-1 survivors into the corpus, restart ----
    // materialize NOW: the lazy frame would re-list survivorsOut after
    // phase 2 appends to it
    val phase1SurvivorRows = spark.read.parquet(survivorsOut)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    writeCorpus(phase1SurvivorRows.toDF("doc_id", "text"))
    val (q1b, q2b) = startQueries()

    // ---- phase 2: new fresh docs AND replays of phase-1 fresh docs ---
    val phase2New = (300L until 450L)
    val phase1FreshReplay = phase1.filter(_ % 3 == 2).take(50)
    phase2New.grouped(75).foreach(g => { feed(g); drain(q1b, q2b) })
    // replay phase-1 fresh VALUES: same doc text, new doc ids — their
    // text is now IN the refreshed corpus, so the exact gate must drop
    val replayIds = phase1FreshReplay.map(v => 20000L + v)
    replayIds.zip(phase1FreshReplay).map { case (id, v) =>
      (id, incomingText(v, nCorpus))
    }.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    drain(q1b, q2b)
    q1b.stop(); q2b.stop()

    // ---- ground truth, computed in batch ----------------------------
    val survivors = spark.read.parquet(survivorsOut)
      .select("doc_id").as[Long].collect().toSet
    val flags = spark.read.parquet(flagsOut)
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSeq

    // exact gate truth: verbatim always drops; phase-1 near-dups and
    // fresh docs survive (different bytes from the BASE corpus). In
    // phase 2 the refreshed corpus contains phase-1's near-dup
    // survivor TEXTS (nearText(u % nCorpus) for phase-1 u % 3 == 1),
    // so a phase-2 near-dup drops iff its corpus residue collides
    // with one of those — at the 100-doc default that is EVERY
    // residue (gcd(3,100)=1 over 300 values covers all of them); at
    // SOAK_CORPUS=500000 none collide and phase-2 near-dups survive.
    // Fresh docs always survive; replays drop (their text entered
    // the corpus at refresh).
    val p1NearResidues = phase1.filter(_ % 3 == 1).map(_ % nCorpus).toSet
    val expectSurvive =
      (phase1.filter(_ % 3 != 0) ++
        phase2New.filter(v => v % 3 == 2 ||
          (v % 3 == 1 && !p1NearResidues.contains(v % nCorpus))))
        .map(10000L + _).toSet
    val survivorViolations =
      (survivors diff expectSurvive).size + (expectSurvive diff survivors).size

    // flag truth: the BATCH application of the exact same gate, phase
    // by phase against the index version that phase streamed against —
    // streaming must equal batch bit-for-bit (same bands, same Jaccard
    // verify), with no pair duplicated or lost across the restart
    def batchFlags(docs: DataFrame, corpusDf: DataFrame): Set[(Long, Long)] =
      StreamingDedup.nearDupFlags(docs,
          StreamingDedup.corpusIndex(corpusDf, "doc_id", "text"),
          "doc_id", "text")
        .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    val baseCorpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        udf(corpusText _).apply(col("id")).as("text"))
    val corpusV2 = baseCorpus
      .unionByName(phase1SurvivorRows.toDF("doc_id", "text"))
    val phase1Docs = phase1
      .map(v => (10000L + v, incomingText(v, nCorpus))).toDF("doc_id", "text")
    val phase2Docs = (phase2New
        .map(v => (10000L + v, incomingText(v, nCorpus))) ++
      replayIds.zip(phase1FreshReplay).map { case (id, v) =>
        (id, incomingText(v, nCorpus))
      }).toDF("doc_id", "text")
    val expectFlags =
      batchFlags(phase1Docs, baseCorpus) ++ batchFlags(phase2Docs, corpusV2)
    val dupFlagRows = flags.groupBy(identity).values.count(_.size > 1)
    val flagViolations = dupFlagRows +
      (flags.toSet diff expectFlags).size +
      (expectFlags diff flags.toSet).size
    // sanity floor: verbatim copies ALWAYS flag (identical sigs match
    // every band), so flags can't be trivially empty-but-equal
    val verbatimFloor =
      (phase1 ++ phase2New).count(_ % 3 == 0) + replayIds.size
    val floorViolation = if (flags.size >= verbatimFloor) 0 else 1

    val violations = survivorViolations + flagViolations + floorViolation
    println(s"""{"survivors":${survivors.size},"expected_survivors":${expectSurvive.size},"flags":${flags.size},"expected_flags":${expectFlags.size},"verbatim_floor":$verbatimFloor,"survivor_violations":$survivorViolations,"flag_violations":$flagViolations,"violations":$violations}""")
    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
    if (violations != 0) sys.exit(1)
  }
}
