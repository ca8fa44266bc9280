package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.operators.{Bpe, CorpusStats, Curation, Packing, Sampling}
import graft.streaming.StatsMaintenance

/** Round-14 item 4: the [[DailyCycleProbe]] composition stretched to a
  * WEEK with the mid-week maintenance a real deployment performs —
  * the piece no single test exercised together:
  *
  *  - days 1..7: curate → encode under the persisted tokenizer →
  *    pack → fold the four maintained stats tables through REAL
  *    checkpointed file streams restarted per day (a daily cron);
  *  - day 4: OFFLINE RETRACTION of day 2 (a takedown request):
  *    [[StatsMaintenance.retractBatch]] subtracts day 2's recomputed
  *    partial from every store WITHOUT advancing the watermark — day
  *    5's genuinely new batch must still fold;
  *  - day 5: TOKENIZER REFRESH: +N merges trained under the growth
  *    contract (same training corpus ⇒ the old merge list is a strict
  *    prefix, vocab ids only APPEND — verified pair-for-pair), then
  *    published versioned with the PREVIOUS version still servable
  *    (retain=2 grace window); days 5..7 encode under the refreshed
  *    tokenizer while days 1..4's encoded ids stay valid;
  *  - day 6: a KILL injected inside the token store's fold at the
  *    post-parquet window — the STREAM dies mid-publish, the torn
  *    version is invisible, and the restarted stream (same
  *    checkpoint) re-delivers and re-folds the batch;
  *  - adjudication: all four maintained tables ≡ a from-scratch
  *    recompute over the SURVIVING curated days {1,3,4,5,6,7}, exact
  *    set equality, plus bin-mass conservation and zero UNK ids every
  *    day.
  *
  * {{{
  * DC_DIR=target/testdata/sf10z sbt 'runMain graft.tools.WeeklyCycleProbe'
  * }}}
  */
object WeeklyCycleProbe {
  private final class SimulatedKill(val at: String)
    extends RuntimeException(s"simulated kill at $at")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("DC_DIR", "target/testdata/sf10z")
    val nMerges = sys.env.getOrElse("DC_MERGES", "2000").toInt
    val extraMerges = sys.env.getOrElse("DC_EXTRA_MERGES", "500").toInt
    val budget = sys.env.getOrElse("DC_BUDGET", "2048").toInt
    val nDays = 7
    val retractDay = 2   // which day's data is taken down
    val retractOn = 4    // the day the takedown is executed
    val refreshOn = 5    // the day the tokenizer is refreshed
    val killOn = 6       // the day a fold is killed mid-publish
    val work = java.nio.file.Files
      .createTempDirectory("graft-weeklycycle").toString
    println(s"[weekly-cycle] dir=$dir merges=$nMerges+$extraMerges " +
      s"budget=$budget work=$work")

    val lines0 = transform(
      graft.functions.TextFunctions.tokenChunks(col("text"), 8, 8),
      c => concat(array_join(c.getField("toks"), " "), lit(".")))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter today for offers.\n"))
            .otherwise(lit("")),
          array_join(lines0, "\n"),
          when(col("doc_id") % 5 === 0,
            lit("\nall rights reserved by the site owner."))
            .otherwise(lit(""))).as("text"))
    def rawDay(d: Int): DataFrame =
      docs.where(pmod(col("doc_id"), lit(nDays.toLong)) === (d - 1).toLong)

    val shapes = Seq[(String, Seq[String], Seq[String], DataFrame => DataFrame)](
      ("line", Seq("line_key"), Seq("line_df"),
        b => CorpusStats.lineDf(b, "doc_id", "clean_text")),
      ("token", Seq("token"), Seq("token_df"),
        b => CorpusStats.tokenDf(b, "doc_id", "clean_text")),
      ("bigram", Seq("w1", "bg"), Seq("n"),
        b => CorpusStats.bigramCounts(b, "doc_id", "clean_text")),
      ("dsir", Seq("bucket"), Seq("tgt_n", "raw_n"),
        b => Sampling.dsirModel(b, "doc_id", "clean_text",
          pmod(col("doc_id"), lit(3L)) === 0L, buckets = 4096)))

    val curatedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("clean_text",
        org.apache.spark.sql.types.StringType)))

    def foldDay(only: Option[String]): Unit = {
      val run = shapes.filter(s => only.forall(_ == s._1))
      val queries = run.map { case (name, keys, counts, partialOf) =>
        StatsMaintenance.start(
          spark.readStream.schema(curatedSchema)
            .option("maxFilesPerTrigger", "1").parquet(s"$work/drop/day*"),
          s"$work/stores/$name", keys, counts, partialOf,
          s"$work/ckpt/$name")
      }
      try queries.foreach(_.processAllAvailable())
      finally queries.foreach(_.stop())
    }

    var merges: Seq[(Int, String, String)] = Seq.empty
    var vocab: Seq[(Int, String)] = Seq.empty
    var day7FoldWall = 0.0

    (1 to nDays).foreach { d =>
      println(s"[weekly-cycle] === day $d ===")
      val tDay = System.nanoTime()
      val staged = Curation.curateStaged(rawDay(d), "doc_id", "text",
        "source", Map.empty, budget = budget, nShards = 16,
        lineDedupMaxDf = Some(10), persistStages = true)
      try {
        staged.result.select(col("doc_id"), col("clean_text"))
          .coalesce(1).write.mode("overwrite").parquet(s"$work/drop/day$d")
      } finally staged.close()
      val curatedDay = spark.read.parquet(s"$work/drop/day$d")
      println(s"[weekly-cycle] curated: ${curatedDay.count()} docs")

      // tokenizer: train day 1, refresh (+N merges, growth) day 5
      if (d == 1) {
        merges = Bpe.trainMergesLocal(
          curatedDay.withColumnRenamed("clean_text", "text"), "text",
          nMerges)
        vocab = Bpe.vocab(
          curatedDay.withColumnRenamed("clean_text", "text"), "text", merges)
        Bpe.saveTokenizerVersioned(spark, merges, vocab, s"$work/tokenizer")
        println(s"[weekly-cycle] tokenizer v1 published: " +
          s"${merges.size} merges, ${vocab.size} vocab")
      } else if (d == refreshOn) {
        // GROWTH CONTRACT: same training corpus, more merges — the old
        // list must be a strict prefix and old vocab ids must be
        // byte-stable, or every previously encoded day silently
        // renumbers. Verified, then published with the previous
        // version still servable (retain=2 grace window).
        val day1 = spark.read.parquet(s"$work/drop/day1")
          .withColumnRenamed("clean_text", "text")
        val (oldM, oldV) = Bpe.loadTokenizerVersioned(spark, s"$work/tokenizer")
        val grown = Bpe.trainMergesLocal(day1, "text", nMerges + extraMerges)
        require(grown.take(oldM.size) == oldM,
          "tokenizer refresh BROKE the growth contract: old merge list " +
            "is not a prefix of the grown one")
        val grownV = Bpe.vocab(day1, "text", grown)
        require(grownV.take(oldV.size) == oldV,
          "tokenizer refresh RENUMBERED existing vocab ids")
        Bpe.saveTokenizerVersioned(spark, grown, grownV, s"$work/tokenizer")
        merges = grown
        vocab = grownV
        println(s"[weekly-cycle] tokenizer REFRESHED: ${oldM.size} -> " +
          s"${grown.size} merges, ${oldV.size} -> ${grownV.size} vocab; " +
          "old ids verified stable, previous version retained")
      } else {
        val (m, v) = Bpe.loadTokenizerVersioned(spark, s"$work/tokenizer")
        merges = m; vocab = v
      }

      // encode + pack under the current tokenizer
      Bpe.encodeIds(curatedDay, "doc_id", "clean_text", merges, vocab)
        .write.mode("overwrite").parquet(s"$work/day$d/enc")
      val enc = spark.read.parquet(s"$work/day$d/enc")
      val encIds = enc.agg(sum(col("n_ids"))).collect()(0).getLong(0)
      val unk = enc.select(explode(col("ids")).as("id"))
        .where(col("id") === -1).count()
      require(unk == 0L, s"day $d: $unk UNK ids")
      Packing.binIdSequences(enc, "doc_id", budget, nShards = 16)
        .write.mode("overwrite").parquet(s"$work/day$d/bins")
      val packed = spark.read.parquet(s"$work/day$d/bins")
        .agg(sum(col("n_ids"))).collect()(0).getLong(0)
      require(packed == encIds,
        s"day $d: packed id mass $packed != encoded $encIds")
      println(s"[weekly-cycle] encoded $encIds ids, packed, 0 UNK")

      // fold the four stores; on kill day, the token store dies
      // mid-publish and must recover through its own checkpoint
      val tFold = System.nanoTime()
      if (d == killOn) {
        var armed = true
        StatsMaintenance.testCrashPoint = p =>
          if (armed && p == "post-parquet") {
            armed = false; throw new SimulatedKill(p)
          }
        val killed = try {
          foldDay(Some("token")); false
        } catch {
          case e: StreamingQueryException =>
            var c: Throwable = e
            while (c != null && !c.isInstanceOf[SimulatedKill]) c = c.getCause
            require(c != null, s"stream died of something else: $e")
            true
        } finally StatsMaintenance.testCrashPoint = _ => ()
        require(killed, "injected kill did not fire")
        println("[weekly-cycle] token fold KILLED post-parquet; " +
          "restarting from checkpoint")
        foldDay(Some("token")) // redelivery folds the torn batch
        foldDay(Some("line")); foldDay(Some("bigram")); foldDay(Some("dsir"))
      } else {
        foldDay(None)
      }
      val foldWall = (System.nanoTime() - tFold) / 1e9
      if (d == nDays) day7FoldWall = foldWall
      shapes.foreach { case (name, _, _, _) =>
        val wm = StatsMaintenance.lastFolded(spark, s"$work/stores/$name")
        require(wm.contains(d - 1L),
          s"$name watermark $wm after day $d (expected ${d - 1})")
      }
      println(f"[weekly-cycle] folds done: $foldWall%.0fs")

      // mid-week takedown: retract day 2 from every store, offline,
      // watermark must NOT move (or day 5 would be skipped as a replay)
      if (d == retractOn) {
        val victim = spark.read.parquet(s"$work/drop/day$retractDay")
        shapes.foreach { case (name, keys, counts, partialOf) =>
          StatsMaintenance.retractBatch(spark, s"$work/stores/$name",
            partialOf(victim), keys, counts)
          val wm = StatsMaintenance.lastFolded(spark, s"$work/stores/$name")
          require(wm.contains(d - 1L),
            s"$name: retraction moved the watermark to $wm")
        }
        println(s"[weekly-cycle] day $retractDay RETRACTED from all " +
          "four stores; watermarks unmoved")
      }
      println(f"[weekly-cycle] day $d total " +
        f"${(System.nanoTime() - tDay) / 1e9}%.0fs")
    }

    // adjudication: maintained == recompute over SURVIVING days
    val survivors = (1 to nDays).filterNot(_ == retractDay)
      .map(d => s"$work/drop/day$d")
    val surviving = spark.read.parquet(survivors: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    surviving.count(): Unit
    val tRe = System.nanoTime()
    val drift = shapes.map { case (name, _, _, partialOf) =>
      val recompute = partialOf(surviving)
      val maintained =
        StatsMaintenance.readStats(spark, s"$work/stores/$name").get
      val onlyM = maintained.except(recompute).count()
      val onlyR = recompute.except(maintained).count()
      println(s"[weekly-cycle] $name: maintained-minus-recompute=$onlyM " +
        s"recompute-minus-maintained=$onlyR")
      (name, onlyM + onlyR)
    }
    val recomputeWall = (System.nanoTime() - tRe) / 1e9
    require(drift.forall(_._2 == 0L), s"maintained tables drifted: $drift")
    println(f"[weekly-cycle] PASS: 7 days, day-2 retraction, day-5 " +
      f"tokenizer refresh (ids stable), day-6 mid-publish kill " +
      f"recovered; all four maintained tables == surviving-days " +
      f"recompute. day-7 incremental fold $day7FoldWall%.0fs vs " +
      f"6-day recompute+compare $recomputeWall%.0fs")
    spark.stop()
  }
}
