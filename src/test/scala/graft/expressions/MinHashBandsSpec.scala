package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Dedup

/** The fused band-key kernel must be byte-identical to the HOF
  * formulation it replaced (`array_min(transform(set, seeded(_,i)))`
  * × k + `concat_ws`), including the two edges the chain defined
  * implicitly: null elements are skipped (`array_min` semantics) and
  * an empty or null set renders keys with no signature parts
  * (`concat_ws` null-skip). Key drift here would silently desync the
  * streaming gate from the batch-built corpus index.
  */
class MinHashBandsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-kernel HOF formulation, kept verbatim as the oracle. */
  private def hofBandArray(set: org.apache.spark.sql.Column, k: Int,
      rowsPerBand: Int): org.apache.spark.sql.Column = {
    val sigs = (0 until k).map { i =>
      array_min(transform(set, h => graft.functions.HashFunctions.seeded(h, i)))
    }
    array((0 until k / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand).map(r => sigs(b * rowsPerBand + r))
      concat_ws(":", lit(b) +: parts: _*)
    }: _*)
  }

  test("fused kernel matches the HOF formulation on real shingle sets") {
    val sets = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Dedup.hashedShingleSet(col("text"), 5).as("s"))
    val mismatches = sets.select(
        Dedup.rowBandArray(col("s"), 8, 2).as("fused"),
        hofBandArray(col("s"), 8, 2).as("hof"))
      .where(not(col("fused") <=> col("hof"))).count()
    assert(mismatches == 0L)
  }

  test("empty and null sets key identically to the HOF chain") {
    val df = Seq(
        (1L, Some(Seq(123456789L, 42L))),
        (2L, Some(Seq.empty[Long])),
        (3L, None))
      .toDF("id", "s")
    val rows = df.select(col("id"),
        Dedup.rowBandArray(col("s"), 4, 2).as("fused"),
        hofBandArray(col("s"), 4, 2).as("hof"))
      .orderBy("id")
      .as[(Long, Seq[String], Seq[String])].collect()
    rows.foreach { case (id, fused, hof) =>
      assert(fused == hof, s"id=$id drifted: $fused vs $hof")
    }
    // empty/null ⇒ band index only, never matchable against "b:…" keys
    assert(rows(1)._2 == Seq("0", "1") && rows(2)._2 == Seq("0", "1"))
  }

  test("null elements are skipped exactly as array_min skips them") {
    val df = Seq(1).toDF("x").select(
      array(lit(77L), lit(null).cast("long"), lit(5L)).as("s"))
    val (fused, hof) = df.select(
        Dedup.rowBandArray(col("s"), 4, 2).as("f"),
        hofBandArray(col("s"), 4, 2).as("h"))
      .as[(Seq[String], Seq[String])].head()
    assert(fused == hof)
  }

  test("compiles under Janino and matches interpreted") {
    val e = MinHashBands(
      BoundReference(0, ArrayType(LongType, containsNull = false),
        nullable = true), 8, 2)
    val compiled = GenerateUnsafeProjection.generate(Seq(e)) // throws if rejected
    val row = InternalRow(ArrayData.toArrayData(Array(987654321L, 13L, 500000003L)))
    val got = compiled(row).getArray(0)
    val want = e.eval(row).asInstanceOf[ArrayData]
    assert(got.numElements() == want.numElements())
    (0 until want.numElements()).foreach { i =>
      assert(got.getUTF8String(i) == want.getUTF8String(i))
    }
  }

  test("rejects k not a multiple of rowsPerBand") {
    val child = BoundReference(0, ArrayType(LongType, containsNull = false),
      nullable = true)
    intercept[IllegalArgumentException] { MinHashBands(child, 7, 2) }
  }
}
