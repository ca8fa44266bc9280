package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * A naive `p >= lo AND p < hi` join has no equi-key, so Catalyst
  * plans a broadcast-nested-loop or cartesian — O(|points|×|intervals|)
  * comparisons, a scale-killer. This operator buckets the number line:
  * every interval is exploded onto the fixed-width buckets it touches,
  * every point lands in exactly one bucket, and the join becomes a
  * hash equi-join on the bucket id followed by the exact range filter.
  *
  * Cost: the interval side grows by ~width/bucketWidth rows per
  * interval (choose `bucketWidth` near the typical interval width so
  * the amplification is a small constant); the point side is
  * unamplified, and both sides shuffle once on the bucket id — or not
  * at all when the exploded interval side is small enough to
  * broadcast, the common case for banding/bucketing dimensions.
  * No-cross-product is asserted in PlanAuditSpec.
  *
  * Intervals are [lo, hi) half-open; point/lo/hi must be numeric and
  * column names of the two frames must be disjoint.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // hi is exclusive but floor(hi/w) is kept: a point equal to an
    // exact bucket boundary belongs to the next bucket, and the range
    // filter discards any false positives the extra bucket admits
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs whose half-open intervals
    * [aLo, aHi) × [bLo, bHi) intersect. Both sides explode onto their
    * covering buckets and equi-join on the bucket id; the residual
    * filter keeps true overlaps. An overlapping pair can share many
    * buckets, so each pair is emitted ONLY from its canonical bucket —
    * the bucket of max(aLo, bLo), the first bucket both intervals
    * occupy — which dedups without a distinct-shuffle over the output.
    * Column names of the two frames must be disjoint.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    exploded(left, aLo, aHi).join(exploded(right, bLo, bHi), Seq("__bucket"))
      .where(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .where(col("__bucket") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
