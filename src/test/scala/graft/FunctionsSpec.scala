package graft

import org.apache.spark.sql.functions._

import graft.etl.{AccessLogParser, LogGen}

/** Native codegen expression coverage (graft_tokenize). */
class FunctionsSpec extends SparkSpec {

  test("graft_tokenize is registered and matches the scanner exactly") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_tokenize"))
    val lines = LogGen.lines(100, seed = 31, extraFrac = 0.2)
    val viaExpr = lines.toDF("value")
      .select(call_function("graft_tokenize", $"value").as("f"))
      .collect().map(_.getSeq[String](0))
    lines.zip(viaExpr).foreach { case (line, got) =>
      assert(got == AccessLogParser.tokenize(line).toSeq)
    }
  }

  test("graft_tokenize null input yields null, participates in codegen") {
    import spark.implicits._
    // repartition: keeps ConvertToLocalRelation from eagerly folding the
    // tiny local input, so we see the real codegen'd plan
    val df = Seq[String](null, "a b").toDF("value").repartition(2)
      .select(call_function("graft_tokenize", $"value").as("f"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).getSeq[String](0) == Seq("a", "b"))
    // the expression must fuse into a WholeStageCodegen stage — AQE's
    // renderer prints codegen stages as `*(n) Project [...]`
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_tokenize.*"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("parse() uses the native expression under a graft session") {
    import spark.implicits._
    val df = AccessLogParser.parse(
      LogGen.lines(10, seed = 32).toDF("value").repartition(2))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), plan)
    assert(df.count() == 10)
  }
}
