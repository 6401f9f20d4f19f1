package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hashSplit: disjoint, complete, deterministic, partition-invariant") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val (train, holdout) = TextOps.hashSplit(docs, "doc_id", 10)
    val trainIds = train.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    val holdIds = holdout.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(trainIds.intersect(holdIds).isEmpty)
    assert(trainIds.size + holdIds.size === docs.count())
    // ~10% holdout, hash-uniform (binomial tolerance on 500 docs)
    assert(holdIds.size > 20 && holdIds.size < 90, s"holdout=${holdIds.size}")
    // pure function of the id: same split after an arbitrary repartition
    val (_, holdout2) = TextOps.hashSplit(docs.repartition(7), "doc_id", 10)
    val holdIds2 = holdout2.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(holdIds2 === holdIds)
    // a different salt draws a different (but equally valid) split
    val (_, holdout3) = TextOps.hashSplit(docs, "doc_id", 10, salt = "other")
    val holdIds3 = holdout3.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(holdIds3 !== holdIds)
  }

  test("membership is stable when the corpus grows") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val half = docs.filter(col("doc_id") < 250)
    val (_, holdSmall) = TextOps.hashSplit(half, "doc_id", 10)
    val (_, holdFull) = TextOps.hashSplit(docs, "doc_id", 10)
    val small = holdSmall.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    val full = holdFull.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(small === full.filter(_ < 250),
      "growing the corpus must not reassign existing docs")
  }

  test("budget sampling: selected docs stay selected as the corpus grows") {
    // prefix selection in doc_id order: appending documents (monotonic
    // ids) can only extend each language's prefix, never evict from it —
    // the curation-stability property a training-mix assembler needs
    val docs = graft.core.Tables.documents(spark, sfDir)
    val half = docs.filter(col("doc_id") < 250)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet
    val selHalf = ids(TextOps.budgetSample(half))
    val selFull = ids(TextOps.budgetSample(docs))
    assert(selHalf === selFull.filter(_ < 250),
      "growth must not change the fate of already-selected docs")
    assert(selHalf.nonEmpty && selFull.size >= selHalf.size)
    // and the budget is respected per language on the full corpus
    val over = TextOps.budgetSample(docs)
      .filter(col("cum_tokens") > col("quota")).count()
    assert(over === 0L)
  }
}
