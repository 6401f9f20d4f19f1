package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.VectorMath

class DotProductSpec extends SparkSpec {

  test("codegen dot product is BIT-identical to the HOF fold") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = (1 to 1000).map { _ =>
      val n = 64
      (Seq.fill(n)(rng.nextGaussian()), Seq.fill(n)(rng.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
    // exact double equality — the fold order must be the same IEEE sequence
    val bad = df.select(VectorMath.dot(col("a"), col("b")).as("fast"),
        VectorMath.dotViaHof(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("edge semantics mirror the composed form") {
    import spark.implicits._
    // length mismatch → NULL (zip_with pads + fold absorbs null)
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).head
    assert(mismatch.isNullAt(0))
    // empty vectors → 0.0 (the fold's init)
    val empty = Seq((Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).head
    assert(empty.getDouble(0) === 0.0)
    // null array → NULL
    val n = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).head
    assert(n.isNullAt(0))
  }
}
