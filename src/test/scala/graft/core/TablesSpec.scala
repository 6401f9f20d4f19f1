package graft.core

import graft.SparkSpec

class TablesSpec extends SparkSpec {
  test("reader cache: one live entry per session, identical plan on re-read") {
    val a = Tables.documents(spark, "/root/testdata/sf0.001")
    val b = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(a eq b, "second read must be a cache hit, not a new plan")
    // The shared test session is the only live one; a stopped session would
    // be purged on this access (can't be demonstrated in-suite — stopping
    // the session kills the shared SparkContext for every other spec).
    assert(Tables.cachedSessionCount === 1)
  }
}
