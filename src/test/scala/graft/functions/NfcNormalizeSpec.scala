package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.NfcNormalizeExpr
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The NFC kernel must BE `java.text.Normalizer` (UAX #15 canonical
  * composition) — the `text_normalize` oracle hash-matches it against
  * DuckDB's utf8proc, so any drift from the standard surfaces as a gate
  * failure. The spec pins the kernel to the reference on adversarial
  * unicode (combining marks, Hangul jamo, surrogate pairs), the ASCII
  * zero-copy fast path, idempotence, and null/SQL plumbing.
  */
class NfcNormalizeSpec extends SparkSpec {

  private def ref(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFC)

  test("composes known decomposed sequences") {
    import spark.implicits._
    val cases = Seq(
      "é",            // e + combining acute → é
      "ñ",            // n + combining tilde → ñ
      "ö",            // o + combining diaeresis → ö
      "각", // Hangul jamo → precomposed syllable 각
      "Å",            // A + ring → Å
      "ṩ")      // multiple marks: canonical ordering applies
    val out = cases.toDF("s")
      .select(TextNorm.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0))
    cases.zip(out).foreach { case (in, got) =>
      assert(got === ref(in), s"input ${in.map(c => f"\\u$c%04x").mkString}")
      assert(got.length < in.length, "composition must shorten these cases")
    }
  }

  test("agrees with java.text.Normalizer on randomized unicode") {
    import spark.implicits._
    val rng = new scala.util.Random(0x9fc)
    val marks = Seq('́', '̀', '̈', '̃', '̧')
    val bases = "aeiouncAEIOU"
    val rows = (1 to 400).map { i =>
      val sb = new StringBuilder
      (0 until rng.nextInt(20)).foreach { _ =>
        rng.nextInt(4) match {
          case 0 => sb.append(bases(rng.nextInt(bases.length)))
          case 1 => sb.append(marks(rng.nextInt(marks.size)))
          case 2 => sb.append(' ')
          case 3 => sb.appendAll(Character.toChars( // astral: surrogate pair
            0x1f300 + rng.nextInt(64)))
        }
      }
      (i, sb.toString)
    }
    val got = rows.toDF("id", "s")
      .select(col("id"), TextNorm.nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    rows.foreach { case (id, s) => assert(got(id) === ref(s), s"row $id") }
    // non-vacuity: some rows actually changed under composition
    assert(rows.exists { case (id, s) => got(id) != s })
  }

  test("ASCII fast path returns the same UTF8String, zero-copy") {
    val s = UTF8String.fromString("plain ascii text 123")
    assert(NfcNormalizeExpr.normalize(s) eq s)
    // already-NFC non-ASCII also avoids re-encoding
    val nfc = UTF8String.fromString("déjà vu")
    assert(NfcNormalizeExpr.normalize(nfc) eq nfc)
  }

  test("idempotent: nfc(nfc(x)) = nfc(x)") {
    import spark.implicits._
    val df = Seq("été", "가", "abc", "ṩ")
      .toDF("s")
    val twice = df.select(
        TextNorm.nfc_normalize(col("s")).as("once"),
        TextNorm.nfc_normalize(TextNorm.nfc_normalize(col("s"))).as("twice"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("null propagates; SQL registration works") {
    import spark.implicits._
    val df = Seq(Option("é"), None).toDF("s")
    val out = df.select(TextNorm.nfc_normalize(col("s")).as("n")).collect()
    assert(out(0).getString(0) === "é")
    assert(out(1).isNullAt(0))
    TextNorm.register(spark)
    df.createOrReplaceTempView("nfc_in")
    val sqlOut = spark.sql("SELECT nfc_normalize(s) AS n FROM nfc_in")
      .collect()
    assert(sqlOut(0).getString(0) === "é")
    assert(sqlOut(1).isNullAt(0))
  }
}
