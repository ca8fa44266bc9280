package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for [[graft.operators.Similarity.pqTopK]] at the
  * 2M-vector decade: encode throughput (the store-side cost), ADC
  * scan wall vs the exact brute scan, recall@k against brute ground
  * truth per ksub, and the MEASURED on-disk compression of the code
  * table vs the float vectors — the number the 100 TB story rests on.
  *
  * {{{
  * PQ_DIR=/tmp/sf100e sbt 'runMain graft.tools.PqProbe'
  * }}}
  */
object PqProbe {
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

    val dir = sys.env.getOrElse("PQ_DIR", "/tmp/sf100e")
    val k = sys.env.getOrElse("PQ_K", "10").toInt
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val queries = e.where(col("vec_id") < 10)
    println(s"[pq-probe] dir=$dir vectors=$n k=$k")

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[pq-probe] $what wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    def topMap(df: DataFrame): Map[Long, Seq[Long]] =
      df.select($"query_id", $"neighbor_id", $"score")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1)
        .map { case (q, rows) =>
          q -> rows.sortBy(r => (-r._3, r._2)).map(_._2).toSeq
        }

    val brute = timed("brute scan")(
      topMap(Similarity.bruteTopK(queries, e, "vec_id", "embedding", k)))

    // (label, m, ksub, books): exemplar books vs per-subspace-k-means
    // books trained on a 5% deterministic sample; m sweeps the code
    // budget (m·log2(ksub) bits per vector)
    val sample = e.where(
      graft.operators.Sampling.deterministicKeep(col("vec_id"), 50))
    def train(m: Int, ksub: Int) =
      timed(s"train m=$m ksub=$ksub iters=5 on 5% sample")(
        Similarity.pqTrainCodebooks(sample, "vec_id", "embedding",
          m = m, ksub = ksub, iters = 5))
    val variants: Seq[(String, Int, Int, Seq[Seq[Seq[Double]]])] = Seq(
      ("exemplar m=8 ksub=8", 8, 8,
        Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 8)),
      ("exemplar m=8 ksub=16", 8, 16,
        Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 16)),
      ("trained m=8 ksub=16", 8, 16, train(8, 16)),
      ("trained m=16 ksub=16", 16, 16, train(16, 16)))

    // cluster labels (10 Gaussian generator blobs) for the routing metric
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap

    variants.zipWithIndex.foreach { case ((label, m, ksub, books), vi) =>
      // store-side: encode the whole corpus once, write the code table
      val enc = Similarity.pqEncode(e, "vec_id", "embedding", books)
      val encPath = s"/tmp/pq_probe_codes_$vi"
      timed(s"$label encode+write")(
        enc.write.mode("overwrite").parquet(encPath))
      def du(p: String): Long = {
        val d = new java.io.File(p)
        if (d.isFile) d.length
        else if (d.isDirectory) d.listFiles.map(f => du(f.getPath)).sum
        else 0L
      }
      val vecBytes = du(s"$dir/embeddings.parquet")
      val codeBytes = du(encPath)
      println(f"[pq-probe] $label code_table=${codeBytes / 1e6}%.1f MB " +
        f"vectors=${vecBytes / 1e6}%.1f MB ratio=${vecBytes.toDouble / codeBytes}%.1fx")

      // ADC top-R shortlist: R = 100·k covers the re-rank architecture
      // (ADC scan → exact re-score of the shortlist); direct recall@k
      // of raw ADC ranks is NOT the operative number on this corpus —
      // top-10-of-2M inside a tight Gaussian blob differ by ~1e-3
      // cosine, below any m-byte code's resolution
      val shortK = 100 * k
      val pqShort = timed(s"$label ADC scan (top-${shortK})")(
        topMap(Similarity.pqTopK(queries, e, "vec_id", "embedding", shortK,
          m = m, ksub = ksub, codebooks = Some(books))))
      val recallK = brute.keys.toSeq.sorted.map { q =>
        pqShort.getOrElse(q, Nil).take(k).toSet
          .intersect(brute(q).toSet).size.toDouble / k
      }
      val recallShort = brute.keys.toSeq.sorted.map { q =>
        pqShort.getOrElse(q, Nil).toSet
          .intersect(brute(q).toSet).size.toDouble / k
      }
      println(f"[pq-probe] $label raw-ADC recall@$k mean=" +
        f"${recallK.sum / recallK.size}%.2f; shortlist(R=$shortK) " +
        f"recall of brute top-$k mean=${recallShort.sum / recallShort.size}%.2f " +
        f"min=${recallShort.min}%.2f")
      val routed = brute.keys.toSeq.sorted.map { q =>
        val ql = labels(q)
        val top = pqShort.getOrElse(q, Nil).take(k)
        top.count(n => labels(n) == ql).toDouble / top.size
      }
      println(f"[pq-probe] $label cluster-routing@$k mean=" +
        f"${routed.sum / routed.size}%.2f min=${routed.min}%.2f")
    }
    // IVFPQ: residual encoding — PQ books see v − centroid(cell), so
    // code entropy goes to WITHIN-cell variance instead of re-encoding
    // cluster identity (the failure mode measured above)
    Seq(("ivfpq exemplar m=8", 0, 8),
        ("ivfpq trained iters=5 m=8", 5, 8),
        ("ivfpq trained iters=5 m=16", 5, 16)).foreach {
      case (label, iters, m) =>
        val shortK = 100 * k
        val short = timed(s"$label nlist=16 nprobe=4 scan (top-$shortK)")(
          topMap(Similarity.ivfPqTopK(queries, e, "vec_id", "embedding",
            shortK, nlist = 16, nprobe = 4, m = m, ksub = 16,
            trainIters = iters)))
        val rK = brute.keys.toSeq.sorted.map { q =>
          short.getOrElse(q, Nil).take(k).toSet
            .intersect(brute(q).toSet).size.toDouble / k
        }
        val rS = brute.keys.toSeq.sorted.map { q =>
          short.getOrElse(q, Nil).toSet
            .intersect(brute(q).toSet).size.toDouble / k
        }
        println(f"[pq-probe] $label raw-ADC recall@$k mean=" +
          f"${rK.sum / rK.size}%.2f; shortlist(R=$shortK) recall mean=" +
          f"${rS.sum / rS.size}%.2f min=${rS.min}%.2f")
    }
    // Planted-near-neighbor recall — the OPERATIVE metric. The bulk
    // metrics above saturate at ~0.2-0.3 for every code budget because
    // top-10-of-200k iid Gaussian blob-mates concentrate at ~the same
    // cosine (the top-10 ↔ top-1000 gap is below ANY m-byte code's
    // resolution — an information-theoretic property of this synthetic
    // corpus, not a defect). Real retrieval targets — near-dups,
    // paraphrases — sit far above the bulk; plant 20 such neighbors
    // per query (one-dim +0.02 perturbation, cos ≈ 0.9995) and measure
    // whether the ADC scan surfaces them.
    locally {
      val planted = queries
        .withColumn("__i", explode(lit((0 until 20).toArray)))
        .select((lit(5000000L) + col("vec_id") * 100 + col("__i")).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x + when(j === pmod(col("__i"), lit(64)), lit(0.02))
              .otherwise(lit(0.0))).cast("float")).as("embedding"))
      val e2 = e.unionByName(planted)
      val books = train(8, 16)
      def plantedRecall(out: Map[Long, Seq[Long]], at: Int): Seq[Double] =
        brute.keys.toSeq.sorted.map { q =>
          val want = (0 until 20).map(i => 5000000L + q * 100 + i).toSet
          out.getOrElse(q, Nil).take(at).toSet.intersect(want).size.toDouble / 20
        }
      val bruteP = timed("planted brute top-20")(
        topMap(Similarity.bruteTopK(queries, e2, "vec_id", "embedding", 20)))
      val rb = plantedRecall(bruteP, 20)
      println(f"[pq-probe] planted recall@20 brute mean=${rb.sum / rb.size}%.2f")
      val pqTrained = timed("planted PQ trained m=8 ksub=16 top-20")(
        topMap(Similarity.pqTopK(queries, e2, "vec_id", "embedding", 20,
          m = 8, ksub = 16, codebooks = Some(books))))
      val pqEx = timed("planted PQ exemplar m=8 ksub=16 top-20")(
        topMap(Similarity.pqTopK(queries, e2, "vec_id", "embedding", 20,
          m = 8, ksub = 16)))
      val ivfpq = timed("planted IVFPQ trained m=8 nlist=16 nprobe=4 top-20")(
        topMap(Similarity.ivfPqTopK(queries, e2, "vec_id", "embedding", 20,
          nlist = 16, nprobe = 4, m = 8, ksub = 16, trainIters = 5)))
      Seq(("pq-trained-raw", pqTrained), ("pq-exemplar", pqEx),
          ("ivfpq-trained-residual", ivfpq)).foreach { case (lbl, out) =>
        val r = plantedRecall(out, 20)
        println(f"[pq-probe] planted recall@20 $lbl mean=" +
          f"${r.sum / r.size}%.2f min=${r.min}%.2f")
      }
    }
    println("[pq-probe] OK")
    spark.stop()
  }
}
