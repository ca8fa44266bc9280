package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 32
  private def place(df: org.apache.spark.sql.DataFrame) =
    Packing.packPlacement(df, "doc_id", T.tokenCount(col("text")), budget, 4)

  private def realDocs = graft.core.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  test("placement is an exclusive prefix sum: contiguous within each shard") {
    val rows = place(realDocs)
      .select("shard", "doc_id", "n_tokens", "token_offset")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    rows.foreach { shardRows =>
      val sorted = shardRows.sortBy(_._2)
      assert(sorted.head._4 == 0L, "first doc in a shard starts at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, _, nt, off), (_, _, _, off2)) =>
          assert(off2 == off + nt,
            s"offsets must be gapless head-to-tail: $off + $nt != $off2")
        case _ => ()
      }
    }
  }

  test("bin math: straddles iff the doc crosses a budget boundary") {
    place(realDocs)
      .select("n_tokens", "token_offset", "bin_first", "bin_last", "straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .foreach { case (nt, off, bf, bl, st) =>
        assert(bf == off / budget)
        val expectedLast = if (nt == 0) bf else (off + nt - 1) / budget
        assert(bl == expectedLast, s"bin_last wrong at off=$off nt=$nt")
        assert(st == (bf != bl))
        assert(bl >= bf)
      }
  }

  test("placement is invariant to input partitioning (replay-stable)") {
    val a = place(realDocs).collect().toSet
    val b = place(realDocs.repartition(7)).collect().toSet
    assert(a == b, "repartitioning the input moved a document's bin")
  }

  test("empty and null text occupy zero tokens without moving the cursor") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "   "),
      (5L, "five six")).toDF("doc_id", "text")
    val out = place(docs)
      .select("doc_id", "n_tokens", "bin_first", "bin_last", "straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    out.filter(r => Seq(2L, 3L, 4L).contains(r._1)).foreach { r =>
      assert(r._2 == 0L, s"doc ${r._1} must count 0 tokens")
      assert(r._3 == r._4 && !r._5, "empty docs sit at the cursor, no straddle")
    }
    // total mass is only the real tokens
    assert(out.map(_._2).sum == 6L)
  }

  test("binFill conserves tokens and never overfills a bin") {
    val placement = place(realDocs)
    val fill = Packing.binFill(placement, budget)
      .select("shard", "bin", "n_docs", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val totalPlaced = placement.agg(sum("n_tokens")).as[Long].head()
    assert(fill.map(_._4).sum == totalPlaced,
      "every token lands in exactly one bin")
    fill.foreach { case (sh, bin, nd, nt) =>
      assert(nt >= 1 && nt <= budget, s"bin ($sh,$bin) holds $nt of $budget")
      assert(nd >= 1)
    }
    // bins are contiguous from 0 within each shard: the layout is a
    // head-to-tail concat, so no bin below the high-water mark is empty
    fill.groupBy(_._1).foreach { case (sh, rows) =>
      val bins = rows.map(_._2).sorted.toSeq
      assert(bins.headOption.contains(0L) && bins == (0L until bins.length.toLong),
        s"shard $sh has a hole in its bin sequence")
    }
  }

  test("a doc appears in binFill once per bin it touches") {
    val placement = place(realDocs)
    val spanSum = placement.where(col("n_tokens") > 0)
      .agg(sum(col("bin_last") - col("bin_first") + 1)).as[Long].head()
    val fillDocSum = Packing.binFill(placement, budget)
      .agg(sum("n_docs")).as[Long].head()
    assert(spanSum == fillDocSum)
  }

  test("binIdSequences materializes every bin as the exact stream " +
    "slice: full bins at budget, short last bin, straddles intact, " +
    "empty docs invisible") {
    // ids stand in for encodeIds output: doc d has ids [d*100 .. d*100+n)
    val enc = Seq(
      (1L, 5L, (0 until 5).map(100 + _)),
      (2L, 7L, (0 until 7).map(200 + _)),
      (3L, 0L, Seq.empty[Int]), // empty doc: no tokens, no bins
      (4L, 9L, (0 until 9).map(400 + _)),
      (5L, 4L, (0 until 4).map(500 + _)),
      (6L, 11L, (0 until 11).map(600 + _))).toDF("doc_id", "n_ids", "ids")
    val budget = 6
    val got = Packing.binIdSequences(enc, "doc_id", budget, nShards = 2)
      .orderBy("shard", "bin")
      .as[(Long, Long, Long, Seq[Int])].collect().toSeq
    // reference: per shard, concatenate member ids in doc-id order and
    // slice every `budget` tokens
    val rows = enc.as[(Long, Long, Seq[Int])].collect().toSeq
    val shardOf = Packing.packPlacement(enc, "doc_id", col("n_ids"),
        budget, 2).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    val want = rows.filter(_._2 > 0).groupBy(r => shardOf(r._1)).toSeq
      .flatMap { case (shard, docs) =>
        val stream = docs.sortBy(_._1).flatMap(_._3)
        stream.grouped(budget).zipWithIndex.map { case (bin, ix) =>
          (shard, ix.toLong, bin.size.toLong, bin)
        }
      }.sortBy(r => (r._1, r._2))
    assert(got == want, s"got $got\nwant $want")
    // every non-final bin is exactly full
    got.groupBy(_._1).foreach { case (_, bins) =>
      bins.init.foreach { b =>
        assert(b._3 == budget, s"non-final bin not full: $b") }
    }
  }

  test("binIdSequencesEncoded (fused word-granularity path) equals " +
    "binIdSequences over encodeIds on a real trained corpus — " +
    "word-less docs, unmatched words, and shard offsets included") {
    val docs = realDocs
    val trained = graft.operators.Bpe.trainBpe(docs, "text", 6)
    val voc = graft.operators.Bpe.vocabFromAlphabet(
      trained.alphabet, trained.merges)
    val viaDoc = Packing.binIdSequences(
      graft.operators.Bpe.encodeIds(docs, "doc_id", "text",
        trained.merges, voc, distinctWords = Some(trained.words)),
      "doc_id", budget = 48, nShards = 3)
    val fused = Packing.binIdSequencesEncoded(
      graft.operators.Bpe.encodeWordIds(docs, "doc_id", "text",
        trained.merges, voc, distinctWords = Some(trained.words)),
      "doc_id", budget = 48, nShards = 3)
    val a = viaDoc.orderBy("shard", "bin")
      .as[(Long, Long, Long, Seq[Int])].collect().toSeq
    val b = fused.orderBy("shard", "bin")
      .as[(Long, Long, Long, Seq[Int])].collect().toSeq
    assert(a.nonEmpty && a == b,
      s"fused path diverged: viaDoc=${a.take(3)}... fused=${b.take(3)}...")
  }

  test("binIdSequencesEncoded: null-__ids word rows (word-less docs, " +
    "words outside the vocab table) shift no offsets and emit nothing") {
    // word-granularity rows as encodeWordIds emits them: doc 2 is a
    // word-less doc (one null row), doc 3's middle word is unmatched
    val wordRows = Seq(
      (1L, Some(0), Some(Seq(10, 11))),
      (1L, Some(1), Some(Seq(12))),
      (2L, None, None),
      (3L, Some(0), Some(Seq(30))),
      (3L, Some(1), None), // unmatched word: excluded, moves nothing
      (3L, Some(2), Some(Seq(31, 32, 33))),
      (4L, Some(0), Some(Seq(40, 41, 42, 43, 44))))
      .toDF("doc_id", "__wpos", "__ids")
    val got = Packing.binIdSequencesEncoded(wordRows, "doc_id",
        budget = 4, nShards = 1)
      .orderBy("shard", "bin").as[(Long, Long, Long, Seq[Int])]
      .collect().toSeq
    // stream in doc order with nulls dropped:
    // 10 11 12 | 30 31 32 33 | 40 41 42 43 | 44
    val want = Seq(
      (0L, 0L, 4L, Seq(10, 11, 12, 30)),
      (0L, 1L, 4L, Seq(31, 32, 33, 40)),
      (0L, 2L, 4L, Seq(41, 42, 43, 44)))
    assert(got == want, s"got $got\nwant $want")
  }
}
