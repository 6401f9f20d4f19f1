package graft.text

import org.apache.spark.sql.functions._
import graft.{ByteBpeVolume, SparkSpec}

/** CI-scale gate for the BYTE-level BPE volume proof
  * ([[graft.ByteBpeVolume]], committed artifact
  * dev/bytebpe_volume.json): morphemes live in DISJOINT UTF-8 byte
  * families, so the byte-pair frequencies are stratified by
  * construction (intra-morpheme ≈ 23k, fused-morpheme+</w> ≈ 12k,
  * cross-boundary ≈ 1k) and greedy byte training MUST spend its
  * 4·NMorph budget rediscovering the planted morphemes — after which
  * every vocabulary word segments at its morpheme boundary as
  * [hex(a), hex(b)</w>], and decode∘encode is the identity over the
  * multi-byte vocabulary. */
class ByteBpeVolumeSpec extends SparkSpec {

  test("byte-BPE volume contract at CI scale: all merges are " +
      "byte-level morphology, words segment at the planted boundary, " +
      "round trip lossless") {
    val docs = ByteBpeVolume.corpus(spark, 20000L).localCheckpoint()
    val model = ByteBpe.train(docs, ByteBpeVolume.Merges)
    assert(model.size === ByteBpeVolume.Merges)
    assert(ByteBpeVolume.allIntraUnit(model),
      s"cross-boundary merge learned: ${model.merges}")
    assert(ByteBpeVolume.segmentsAtBoundaries(spark, model))
    val broken = Bpe.wordFreq(docs).select(col("word"),
        ByteBpe.decodeSubs(ByteBpe.encodeWord(col("word"), model)).as("rt"))
      .filter(col("rt") =!= col("word")).count()
    assert(broken === 0L, "multi-byte round trip must be lossless")
  }
}
