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

  test("no gate query plans an unbounded unpartitioned window (single-task hazard)") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit,
      Window => LWindow, WindowGroupLimit}
    // a global orderBy window funnels the whole input through ONE task —
    // q30 shipped that shape for four rounds before the year partition +
    // boundary stitch replaced it. The acceptable unpartitioned forms are
    // the ones whose single task provably sees a BOUNDED input: a global
    // top-k (the optimizer's WindowGroupLimit caps rows per upstream
    // partition) or a window above an explicit GlobalLimit (q15 ranks 10
    // already-limited rows).
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfSmoke).queryExecution.optimizedPlan
      val bare = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
            !w.child.exists(n => n.isInstanceOf[WindowGroupLimit] ||
              n.isInstanceOf[GlobalLimit]) => w
      }
      assert(bare.isEmpty,
        s"$name plans ${bare.size} unbounded window(s) with no PARTITION BY")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfSmoke)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
