package graft

/** The determinism discipline (SURVEY §7.5), made executable for EVERY
  * declared query at once: identical output — row values AND row order —
  * under two different shuffle partitionings.
  *
  * Why this exists next to the DuckDB oracle: the oracle compares one
  * Spark partitioning against DuckDB. A query whose output depends on
  * partition fold order (a raw double sum, an un-tiebroken ORDER BY, a
  * collect_set without sort_array) can still pass the oracle whenever the
  * gate-run partitioning happens to agree — and then flap on the next
  * cluster layout. Running the whole declared surface at 2 vs 7 shuffle
  * partitions forces the partition-order dimension directly, so a newly
  * added query with a latent order dependence fails HERE, in `sbt test`,
  * not in a later round's gate run.
  */
class DeterminismSpec extends SparkSpec {
  test("every declared query is identical across shuffle partitionings") {
    val sf = "/root/testdata/sf0.001"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(parts: String): Map[String, Seq[String]] = {
      spark.conf.set(key, parts)
      SparkEntry.queries.map { case (name, fn) =>
        name -> fn(spark, sf).collect().map(_.toString).toSeq
      }
    }
    try {
      val a = runAll("2")
      val b = runAll("7")
      val differing = a.keys.toSeq.sorted.filter(k => a(k) != b(k))
      // committed audit trail (VERDICT r13: the suite left no trace in
      // the sbt log — auditable only by suite arithmetic): one line with
      // the surface size, the two partitionings, and the verdict,
      // rewritten by every `sbt test` run. No timestamp — the file only
      // diffs when the surface or the verdict changes.
      val art = new java.io.File("dev/determinism.json")
      art.getParentFile.mkdirs()
      java.nio.file.Files.write(art.toPath,
        (s"""{"gate":"DeterminismSpec","n_queries":${a.size},""" +
          s""""partitionings":[2,7],"compares":"values+order",""" +
          s""""differing":[${differing.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""pass":${differing.isEmpty && a.keySet == SparkEntry.queries.keySet}}""" +
          "\n").getBytes("UTF-8"))
      assert(differing.isEmpty,
        s"partition-dependent output in: ${differing.mkString(", ")}")
      // the declared map IS the surface — no hand-maintained count to rot
      assert(a.keySet == SparkEntry.queries.keySet,
        "a declared query was skipped by the gate run")
    } finally spark.conf.set(key, prev)
  }
}
