package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.functions.{VectorFunctions => V}

/** Stage-level cost attribution for the embedding dedup paths on an
  * sf dir's embeddings table (with the planted-dup union the
  * `x_dedup_embedding*` queries use): assignment/bucketing cost vs
  * candidate-join cost vs verify cost, plus the candidate count —
  * the number that decides which blocking variant wins at a given
  * corpus shape. Mirrors `JaccardProbe`'s role for the text path.
  *
  * Args: <sfDir>. Env: PROBE_RUNS (default 2), PROBE_NLIST (32),
  * SPARK_GRAFT_CPUS.
  */
object EmbDedupProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmbDedupProbe <sfDir>")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.getOrElse("PROBE_RUNS", "2").toInt
    val nlist = sys.env.getOrElse("PROBE_NLIST", "32").toInt

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val e = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val src = e.unionByName(e.where(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val nRows = src.count()
      // Same sizing rule as the shipped xDedupEmbeddingIvf query —
      // probing at a different plane count than production would
      // publish timings the query never runs at.
      val resPlanes = Dedup.planesForResidual(math.max(1L, nRows / nlist))
      val rawPlanes = Dedup.planesForClustered(nRows)
      (1 to runs).foreach { r =>
        // residual path, staged
        val planes = Similarity.hyperplanes(resPlanes, 64)
        val cents = Similarity.exemplarCentroids(src, "vec_id", "embedding", nlist)
        val ss = spark
        import ss.implicits._
        val centsDf = cents.zipWithIndex.map { case (c, i) => (i, c) }
          .toDF("__cell", "__cv")
        val n = src.select(col("vec_id").as("__id"), col("embedding").as("__v"))
          .withColumn("__nsq", V.normSq(col("__v")))
          .withColumn("__cell", element_at(
            graft.expressions.RankedCentroidCells.ranked(
              col("__v"), col("__nsq"), cents), 1)("cell"))
          .join(broadcast(centsDf), Seq("__cell"))
          .withColumn("__rv",
            zip_with(V.asDouble(col("__v")), col("__cv"), (x, c) => x - c))
          .withColumn("__bucket", concat_ws(":", col("__cell"),
            Similarity.hyperplaneBucket(col("__rv"), planes)))
          .select(col("__id"), col("__v"), col("__nsq"), col("__bucket"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (_, assignSec) = timed(n.count())
        val cand = n.as("a").join(n.as("b"),
          col("a.__bucket") === col("b.__bucket") && col("a.__id") < col("b.__id"))
        val (nCand, candSec) = timed(cand.count())
        val (nOut, verifySec) = timed(cand
          .withColumn("cos", V.cosinePrenormed(
            V.dot(col("a.__v"), col("b.__v")), col("a.__nsq"), col("b.__nsq")))
          .where(col("cos") > 0.95).count())
        n.unpersist(blocking = true)
        println(f"dir=$dir run=$r rows=$nRows path=residual nlist=$nlist " +
          f"planes=$resPlanes assign_sec=$assignSec%.2f cand=$nCand " +
          f"cand_sec=$candSec%.2f verify_sec=$verifySec%.2f out=$nOut")
        // raw-bucketed path, candidate count only (the 280 s variant) —
        // candSec here includes its (cheap) bucketing scan
        val planesRaw = Similarity.hyperplanes(rawPlanes, 64)
        val nr = src.select(col("vec_id").as("__id"), col("embedding").as("__v"))
          .withColumn("__bucket", Similarity.hyperplaneBucket(col("__v"), planesRaw))
        val (nCandRaw, rawSec) = timed(nr.as("a").join(nr.as("b"),
          col("a.__bucket") === col("b.__bucket") && col("a.__id") < col("b.__id"))
          .count())
        println(f"dir=$dir run=$r rows=$nRows path=raw_bucketed " +
          f"planes=$rawPlanes cand=$nCandRaw cand_sec=$rawSec%.2f")
      }
    }
    spark.stop()
  }
}
