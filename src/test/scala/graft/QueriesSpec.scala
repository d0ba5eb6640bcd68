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

  test("no gate query joins without equi-keys unless one side is provably tiny") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe,
      EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation}
    // a join with no equi-key component executes as a nested-loop/cartesian
    // — quadratic unless one side is bounded. The acceptable forms all
    // make one side provably small: an inline literal table (q18's range
    // bands are a LocalRelation), or an explicitly BROADCAST side — a
    // scalar/constant aggregate (d17's corpus size), a fixed-k centroid
    // table (s04's 16 cells), or the bounded query set of the brute-force
    // kNN baseline (s01/s02 — the exact baseline is INTENTIONALLY
    // linear-scan; the bucketed variants are the scale path). Everything
    // else must carry equi-keys so it hash-partitions.
    // q30's stitch join: both sides are <=6 rows per year by filter
    val broadcastWhitelist = Set("s01_knn_bruteforce", "s02_ann_lsh",
      "s04_ann_ivf", "d17_tfidf_keywords", "q30_sliding_window")
    // top-level conjunct split: `a =!= b` CONTAINS an EqualTo node, so a
    // whole-tree search would miscount it as an equi-key
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfSmoke).queryExecution.optimizedPlan
      val nonEqui = plan.collect {
        case j @ Join(_, _, _, cond, _)
            if !cond.exists(conjuncts(_).exists {
              case _: EqualTo | _: EqualNullSafe => true
              case _ => false
            }) => j
      }
      nonEqui.foreach { j =>
        val inlineSide = Seq(j.left, j.right).exists(_.exists {
          case _: LocalRelation => true
          case _ => false
        })
        // the optimizer folds broadcast() hints into the Join's JoinHint
        val hinted = broadcastWhitelist(name) &&
          Seq(j.hint.leftHint, j.hint.rightHint)
            .exists(_.exists(_.strategy.isDefined))
        assert(inlineSide || hinted,
          s"$name plans a join with no equi-keys and no provably-bounded " +
            "side (inline literal table or whitelisted broadcast)")
      }
    }
  }

  test("filters and projections reach the parquet scan (q01/q02 pushdown)") {
    // the 100 TB contract: a scan that reads all 16 lineitem columns for
    // a 7-column aggregate, or re-filters ship dates AFTER the scan, pays
    // the full corpus in IO. PushedFilters + pruned ReadSchema in the
    // FileSourceScan prove predicate pushdown and column pruning survive
    // any future re-write of these queries.
    val q01 = SparkEntry.queries("q01_pricing_summary")(spark, sfSmoke)
      .queryExecution.sparkPlan.toString
    assert(q01.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"q01 ship-date filter not pushed to the scan:\n$q01")
    assert(!q01.contains("l_orderkey"),
      "q01 scan reads l_orderkey, which the query never uses (pruning lost)")
    val q02 = SparkEntry.queries("q02_revenue_by_nation")(spark, sfSmoke)
      .queryExecution.sparkPlan.toString
    assert(q02.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"q02 order-date filter not pushed to the scan:\n$q02")
    assert(q02.contains("BroadcastHashJoin"),
      "q02 plans no broadcast join for its dimension tables")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfSmoke)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
