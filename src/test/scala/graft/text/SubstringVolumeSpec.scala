package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SubstringVolume}

/** CI-sized run of the volume-proof corpus: ground truth is exact by
  * construction, so recall is an equality, not a statistic. The
  * million-doc measurement itself lives in the committed artifact
  * (dev/substring_volume.json, runMain graft.SubstringVolume). */
class SubstringVolumeSpec extends SparkSpec {

  test("planted-passage recall is exact on the generated corpus") {
    val nDocs = 20000L
    val nPassages = 1000L
    val docsPerPassage = nDocs / SubstringVolume.PlantEvery / nPassages
    val docs = SubstringVolume.corpus(spark, nDocs, nPassages)
      .localCheckpoint()
    val spans = SubstringDedup.dupSpans(docs, SubstringVolume.K)
      .localCheckpoint()
    val (planted, hits, spurious) =
      SubstringVolume.plantedRecall(spans, nDocs)
    assert(planted === nDocs / SubstringVolume.PlantEvery)
    assert(hits === planted, s"recall must be exact: $hits/$planted")
    assert(spurious === 0L,
      "filler 8-grams must never collide into spurious spans")
    // every island's most-shared shingle is shared by exactly the
    // passage's doc count (the doc itself included)
    assert(spans.filter(col("n_sharers") =!= docsPerPassage).count() === 0L)
  }

  test("bucketed shard probe recovers every planted span of the shard") {
    val nDocs = 20000L
    val docs = SubstringVolume.corpus(spark, nDocs, 1000L).localCheckpoint()
    val split = nDocs * 9 / 10
    val table = "substring_volume_spec_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      SubstringDedup.appendShingleIndexBucketed(
        docs.filter(col("doc_id") < split), SubstringVolume.K, table)
      val shard = docs.filter(col("doc_id") >= split)
      val probe = SubstringDedup.shardDupSpansBucketed(
        shard, SubstringVolume.K, table).localCheckpoint()
      // every planted shard doc's passage recurs in the indexed 90%
      // (passage ids cycle every PlantEvery·nPassages = 4000 < split), so
      // the probe must report exactly the planted island per planted doc
      val plantedShard = shard
        .filter(col("doc_id") % SubstringVolume.PlantEvery === 0).count()
      val exact = probe.filter(
        col("span_start") === SubstringVolume.BaseTokens + 1
          && col("span_len") === SubstringVolume.PassageTokens).count()
      assert(plantedShard > 0 && exact === plantedShard,
        s"probe recall must be exact: $exact/$plantedShard")
      assert(probe.count() === plantedShard, "no spurious probe spans")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
