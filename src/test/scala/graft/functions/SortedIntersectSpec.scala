package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SortedIntersect.sorted_intersect_size

class SortedIntersectSpec extends SparkSpec {

  test("merge scan agrees with size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 2000).map { _ =>
      def arr() = Seq.fill(rng.nextInt(40))(rng.nextLong() % 50).sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        sorted_intersect_size(col("a"), col("b")).as("custom"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .filter(col("custom") =!= col("builtin"))
    assert(bad.count() === 0)
  }

  test("duplicate runs count once (set semantics) and nulls propagate") {
    import spark.implicits._
    val dup = Seq((Seq(1L, 2L, 2L, 3L), Seq(2L, 2L, 4L)))
      .toDF("a", "b")
      .select(sorted_intersect_size(col("a"), col("b")).as("c")).head
    assert(dup.getInt(0) === 1)
    val n = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
      .select(sorted_intersect_size(col("a"), col("b")).as("c")).head
    assert(n.isNullAt(0))
  }

  test("registers for SQL and runs through codegen") {
    SortedIntersect.register(spark)
    val got = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c," +
        " sorted_intersect_size(array(1L), array(2L)) AS z").head
    assert(got.getInt(0) === 2 && got.getInt(1) === 0)
    // whole-stage codegen accepts the generated loop (no fallback errors)
    import spark.implicits._
    val big = (1 to 500).map(i => (Seq(i.toLong, i + 1L), Seq(i.toLong)))
      .toDF("a", "b")
      .select(sum(sorted_intersect_size(col("a"), col("b"))).as("s")).head
    assert(big.getLong(0) === 500L)
  }
}
