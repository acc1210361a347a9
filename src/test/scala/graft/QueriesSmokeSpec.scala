package graft

/** Every declared query executes end-to-end at sf0.001 and the flagship
  * entry returns rows (the driver's t1 smoke). Correctness is the
  * driver's DuckDB gate (see tools/check.py); this catches analysis
  * errors and empty schemas early.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }

  test("no query-name collisions across modules (toMap would silently drop)") {
    assert(SparkEntry.modules.map(_._1.size).sum == SparkEntry.queries.size)
    assert(SparkEntry.modules.map(_._2.size).sum == SparkEntry.oracleSql.size)
  }

  test("every query lacking an oracle is on the documented allowlist") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val allowed = Set(
      "f_uuid5",                  // sha1-based; DuckDB has no sha1
      "f_uuid7_validity")         // time-based by design
    assert(rowsOnly == allowed,
      s"new rows-only queries need an oracle or a documented reason: " +
        s"${rowsOnly -- allowed}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      df.limit(5).collect() // forces full execution for agg/sort plans
    }
  }
}
