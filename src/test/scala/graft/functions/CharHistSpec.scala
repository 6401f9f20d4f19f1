package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.CharHist.{char_hist, l1_diff}

class CharHistSpec extends SparkSpec {

  test("l1/2 lower-bounds levenshtein — the prefilter NEVER rejects a match") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val alpha = "abcdeXY z-7"
    def word(n: Int) = Seq.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
    // pairs biased toward near-dups: mutate a base string a few times
    val rows = (1 to 3000).map { _ =>
      val a = word(6 + rng.nextInt(20))
      val b = if (rng.nextBoolean()) {
        val sb = new StringBuilder(a)
        (0 until rng.nextInt(5)).foreach { _ =>
          if (sb.nonEmpty) sb.setCharAt(rng.nextInt(sb.length),
            alpha(rng.nextInt(alpha.length)))
        }
        sb.toString
      } else word(6 + rng.nextInt(20))
      (a, b)
    }
    val violated = rows.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("ed"),
        l1_diff(char_hist(col("a")), char_hist(col("b"))).as("l1"))
      .filter(col("l1") > col("ed") * 2)
    assert(violated.count() === 0,
      "l1_diff(char_hist) must satisfy ed >= l1/2 for every pair")
  }

  test("histogram semantics: case-folded a-z buckets, catch-all bucket 26") {
    import spark.implicits._
    val h = Seq("aA z!").toDF("s")
      .select(char_hist(col("s")).as("h"))
      .head.getSeq[Int](0)
    assert(h.length === 27)
    assert(h(0) === 2)           // 'a' and 'A'
    assert(h(25) === 1)          // 'z'
    assert(h(26) === 2)          // ' ' and '!'
    assert(h.sum === 5)
  }

  test("null array elements propagate NULL instead of being read as 0") {
    graft.functions.CharHist.register(spark)
    // Before the null check l1_diff silently read a null slot as 0 and
    // returned a wrong (shrunken) distance to ad-hoc SQL callers.
    val rows = spark.sql(
      "SELECT l1_diff(array(1, NULL, 3), array(1, 2, 3)) AS bad," +
        " l1_diff(array(1, 2, 3), array(1, 2, 5)) AS good").head
    assert(rows.isNullAt(0), "null element must yield NULL, not a distance")
    assert(rows.getInt(1) === 2)
  }

  test("mismatched histogram widths reject (Int.MaxValue)") {
    import spark.implicits._
    val v = Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
      .select(l1_diff(col("a"), col("b")).as("d")).head.getInt(0)
    assert(v === Int.MaxValue)
  }
}
