package graft

/** Contract checks for the driver gate: every declared query runs at smoke
  * scale, returns rows, and every oracle key points at a declared query.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfSmoke)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
