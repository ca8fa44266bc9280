package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for [[graft.operators.Similarity.pqRerankTopK]] — the
  * two-stage ADC-shortlist → exact-re-rank architecture — at the
  * 2M-vector decade: wall vs the exact brute scan, and end recall@k
  * of brute's top-k (with trained books; exemplar books as control).
  *
  * {{{
  * RERANK_DIR=/tmp/sf100e sbt 'runMain graft.tools.RerankProbe'
  * }}}
  */
object RerankProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = sys.env.getOrElse("RERANK_DIR", "/tmp/sf100e")
    val k = sys.env.getOrElse("RERANK_K", "10").toInt
    val shortK = sys.env.getOrElse("RERANK_SHORTK", s"${100 * k}").toInt
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 10)
    println(s"[rerank-probe] dir=$dir vectors=${e.count()} k=$k shortK=$shortK")

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rerank-probe] $what wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    def topMap(df: DataFrame): Map[Long, Seq[Long]] =
      df.select($"query_id", $"neighbor_id", $"score")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1)
        .map { case (q, rows) =>
          q -> rows.sortBy(r => (-r._3, r._2)).map(_._2).toSeq
        }
    def recall(out: Map[Long, Seq[Long]], want: Map[Long, Seq[Long]]): String = {
      val per = want.keys.toSeq.sorted.map { q =>
        out.getOrElse(q, Nil).take(k).toSet
          .intersect(want(q).toSet).size.toDouble / k
      }
      f"mean=${per.sum / per.size}%.2f min=${per.min}%.2f"
    }

    val brute = timed("brute exact scan")(
      topMap(Similarity.bruteTopK(queries, e, "vec_id", "embedding", k)))
    // runs 2 and 3 amortize JIT/IO warmup, as everywhere at this scale
    (1 to 2).foreach(_ => timed("brute exact scan")(
      Similarity.bruteTopK(queries, e, "vec_id", "embedding", k)
        .write.format("noop").mode("overwrite").save()))

    val sample = e.where(
      graft.operators.Sampling.deterministicKeep(col("vec_id"), 50))
    val trained = timed("train books m=8 ksub=16 iters=5 on 5% sample")(
      Similarity.pqTrainCodebooks(sample, "vec_id", "embedding", 8, 16, 5))
    Seq(("trained", Some(trained)), ("exemplar", None)).foreach {
      case (label, books) =>
        val out = timed(s"rerank $label (ADC top-$shortK -> exact top-$k)")(
          topMap(Similarity.pqRerankTopK(queries, e, "vec_id", "embedding",
            k, shortK, m = 8, ksub = 16, codebooks = books)))
        (1 to 2).foreach(_ => timed(s"rerank $label")(
          Similarity.pqRerankTopK(queries, e, "vec_id", "embedding",
            k, shortK, m = 8, ksub = 16, codebooks = books)
            .write.format("noop").mode("overwrite").save()))
        println(s"[rerank-probe] $label end-recall@$k vs brute: " +
          recall(out, brute))
    }
    // The OPERATIVE metric (same argument as PqProbe): bulk top-10 of
    // an iid Gaussian blob sits ~1e-3 cosine apart — below any m-byte
    // code's resolution, so bulk recall saturates low for every
    // variant. Real retrieval targets (near-dups, paraphrases) sit far
    // above the bulk: plant 20 per query at cos ≈ 0.9995 and measure
    // whether the two-stage architecture surfaces and ranks them.
    locally {
      val planted = queries
        .withColumn("__i", explode(lit((0 until 20).toArray)))
        .select((lit(5000000L) + col("vec_id") * 100 + col("__i")).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x + when(j === pmod(col("__i"), lit(64)), lit(0.02))
              .otherwise(lit(0.0))).cast("float")).as("embedding"))
      val e2 = e.unionByName(planted)
      def plantedRecall(out: Map[Long, Seq[Long]]): String = {
        val per = (0L until 10L).map { q =>
          val want = (0 until 20).map(i => 5000000L + q * 100 + i).toSet
          out.getOrElse(q, Nil).take(20).toSet.intersect(want).size / 20.0
        }
        f"mean=${per.sum / per.size}%.2f min=${per.min}%.2f"
      }
      Seq(("trained", Some(trained)), ("exemplar", None)).foreach {
        case (label, books) =>
          val out = timed(s"planted rerank $label top-20")(
            topMap(Similarity.pqRerankTopK(queries, e2, "vec_id",
              "embedding", 20, shortK, m = 8, ksub = 16, codebooks = books)))
          println(s"[rerank-probe] planted recall@20 rerank-$label: " +
            plantedRecall(out))
      }
    }
    println("[rerank-probe] OK")
    spark.stop()
  }
}
