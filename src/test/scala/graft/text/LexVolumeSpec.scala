package graft.text

import graft.SparkSpec

/** CI-sized twin of [[graft.LexVolume]] (the committed dev/lex_volume.json
  * run is 1M docs + a 100k-doc append): the planted-needle BM25 top-k must
  * equal the driver-computed expectation BIT-EXACTLY — ids, dl, and IEEE
  * double scores — from the index, from the corpus re-scan, and again for
  * both needles after an append advances n_docs and Σdl. */
class LexVolumeSpec extends SparkSpec {

  test("planted top-k is bit-exact at CI scale, before and after append") {
    val nCorpus = 20000L; val nShard = 2000L
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lexvol_ci").toString
    val corpusDf = graft.LexVolume.docs(spark, 0L, nCorpus, "needleone", 100)
    LexIndex.writeIndex(corpusDf, dir)

    // k = 100 spans at least two tf classes (stride 100 pins id % 20 to
    // 0, so each tf class is one score — a top-20 would be a single tie
    // class, bit-exact but degenerate)
    val planted1 = graft.LexVolume.plantedDocs(0L, nCorpus, 100)
    val expect1 = graft.LexVolume.expectedTopK(planted1, nCorpus,
      graft.LexVolume.sumDl(0L, nCorpus, 100), 100)
    assert(graft.LexVolume.collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needleone"), 100)) === expect1)
    assert(graft.LexVolume.collectTopK(
      LexIndex.searchCorpus(corpusDf, Seq("needleone"), 100)) === expect1)
    // the expectation is not degenerate: ties broken, scores distinct tfs
    assert(expect1.size === 100 && expect1.map(_._4).distinct.size > 1)

    LexIndex.appendIndex(
      graft.LexVolume.docs(spark, nCorpus, nShard, "needletwo", 50), dir)
    val nDocs2 = nCorpus + nShard
    val sumDl2 = graft.LexVolume.sumDl(0L, nCorpus, 100) +
      graft.LexVolume.sumDl(nCorpus, nShard, 50)
    // needleone's df is unchanged but its scores MOVED with the stats —
    // a stale-stats index would return the pre-append values
    val expect1b = graft.LexVolume.expectedTopK(planted1, nDocs2, sumDl2, 100)
    assert(expect1b !== expect1)
    assert(graft.LexVolume.collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needleone"), 100)) === expect1b)
    val expect2 = graft.LexVolume.expectedTopK(
      graft.LexVolume.plantedDocs(nCorpus, nShard, 50), nDocs2, sumDl2, 100)
    assert(graft.LexVolume.collectTopK(
      LexIndex.searchTopK(spark, dir, Seq("needletwo"), 100)) === expect2)
  }
}
