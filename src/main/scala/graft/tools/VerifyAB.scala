package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-14 PPJoin adjudication, measurement half: prices the
  * threshold-bounded verify kernel
  * ([[graft.expressions.SortedArrayJaccardBounded]] — the WWW'08
  * suffix-filter idea folded into the merge scan as early
  * termination) against the unbounded kernel on the REAL candidate
  * sets of `Dedup.ngramJaccardPairs` at a given corpus. Candidates
  * are built once and persisted; each verify form then runs twice
  * (first rep carries JIT warm-up) and outputs are asserted
  * identical (count + order-insensitive checksum over (i, j,
  * jaccard)) — early termination must be invisible in the output.
  *
  * {{{
  * PACK_DIR=target/testdata/sf100z sbt 'runMain graft.tools.VerifyAB'
  * }}}
  */
object VerifyAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf100z")
    val threshold = sys.env.getOrElse("PROBE_T", "0.7").toDouble
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[verify-ab] dir=$dir docs=${docs.count()} t=$threshold")

    val (cand0, sets) = Dedup.ngramJaccardCandidates(docs, "doc_id",
      "text", n = 5, threshold = threshold,
      prefixFilterFloor = 20000L, hotBroadcastCap = 512)
    val cand = cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[verify-ab] candidates=${cand.count()}")

    def sig(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("i"), col("j"), col("jaccard"))
          .cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    def timed2(f: => (Long, String)): (Double, Double, (Long, String)) = {
      val t0 = System.nanoTime(); val s1 = f
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime(); val s2 = f
      val t3 = (System.nanoTime() - t2) / 1e9
      assert(s1 == s2, s"reps disagree: $s1 vs $s2")
      (t1, t3, s1)
    }

    val (u1, u2, sigU) =
      timed2(sig(Dedup.jaccardVerifyUnbounded(cand, sets, threshold)))
    val (b1, b2, sigB) =
      timed2(sig(Dedup.jaccardVerify(cand, sets, threshold)))
    require(sigU == sigB,
      s"bounded verify changed the output: $sigU vs $sigB")
    println(f"""{"unbounded_s":[$u1%.2f,$u2%.2f],"bounded_s":[$b1%.2f,$b2%.2f],"out":[${sigU._1},${sigU._2}]}""")
    cand.unpersist(blocking = false)
    sets.unpersist(blocking = false)
    spark.stop()
  }
}
