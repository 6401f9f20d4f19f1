package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CI-sized twin of [[graft.LineVolume]] (the committed
  * dev/line_volume.json run is a 1M-doc corpus): unique lines are
  * injective by construction (df = 1 forever), planted boilerplate lines
  * have df ≫ minDf, so the mined set and every cleaned document are exact
  * set/byte identities — a theorem the implementation must deliver. */
class LineVolumeSpec extends SparkSpec {

  test("planted boilerplate identities are exact at CI scale") {
    val nDocs = 20000L
    val docs = graft.LineVolume.corpus(spark, nDocs).localCheckpoint()

    val bp = TextOps.boilerplateLines(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp.size === graft.LineVolume.NBp)
    assert(bp.keys.forall(_.startsWith("boilerplate footer ")))
    // round-robin plant: every line's df is exactly nDocs/5/NBp
    assert(bp.values.forall(_ === nDocs / 5 / graft.LineVolume.NBp))

    val cleaned = TextOps.lineDedup(docs)
    assert(cleaned.count() === nDocs)
    assert(cleaned.filter(col("cleaned") =!=
      graft.LineVolume.expectedCleaned()).isEmpty)
    assert(cleaned.filter((pmod(col("doc_id"), lit(5)) === 0) =!=
      (col("n_kept") === graft.LineVolume.DocLines - 1)).isEmpty)
  }
}
