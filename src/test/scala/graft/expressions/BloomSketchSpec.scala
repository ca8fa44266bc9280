package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct contract tests for the BloomSketch Column wrappers (the
  * operator-level behavior is covered by the contamination equality
  * suite; this pins the sketch's own guarantees).
  */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key is admitted") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val bytes = keys.toDF("k")
      .agg(BloomSketch.bloomAgg(col("k"), 5000L)).head().getAs[Array[Byte]](0)
    val admitted = keys.toDF("k")
      .where(BloomSketch.mightContain(BloomSketch.bloomLit(bytes), col("k")))
      .count()
    assert(admitted == keys.size, "a Bloom filter must never reject a member")
  }

  test("false-positive rate is in the expected band, not degenerate") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val bytes = keys.toDF("k")
      .agg(BloomSketch.bloomAgg(col("k"), 5000L)).head().getAs[Array[Byte]](0)
    // probe 20k keys guaranteed absent (different residue class)
    val absent = (1L to 20000L).map(_ * 7919L + 1L)
    val fp = absent.toDF("k")
      .where(BloomSketch.mightContain(BloomSketch.bloomLit(bytes), col("k")))
      .count()
    // Spark sizes for ~3% default fpp at the given item count; a
    // degenerate all-true filter (the failure mode that would silently
    // turn the pre-filter into a no-op and the confirm join back into
    // an unthinned shuffle) would admit all 20k
    assert(fp < 2000, s"fpp degenerate: $fp/20000 absent keys admitted")
  }

  test("distributed build merges partials: result equals single-partition build") {
    val keys = (1L to 2000L).map(_ * 104729L)
    def build(parts: Int) = keys.toDF("k").repartition(parts)
      .agg(BloomSketch.bloomAgg(col("k"), 2000L)).head().getAs[Array[Byte]](0)
    val wide = build(16)
    val one = build(1)
    // bit-identical serialized sketches: OR-merge is order-insensitive
    assert(java.util.Arrays.equals(wide, one),
      "partial OR-merge must be layout-independent")
  }
}
