package graft

class QueriesSpec extends SparkSpec {

  test("every query resolves its plan against the current testdata schema") {
    // analysis-first sweep, run FIRST: a harness testdata regeneration
    // that changes a column type (round 7: events.ts ns→us) breaks the
    // build here, naming every affected query, instead of surfacing one
    // at a time at bench/verify time. NOT purely analysis-only: queries
    // with eager driver-side actions during CONSTRUCTION (model fits,
    // OrderStats thresholds, PrefixScan collects — q35/q39/q130/q180
    // family) execute real Spark jobs here, so those failures surface
    // as execution errors; at sf0.001 that costs seconds and is the
    // coverage we want (the eager path is part of building the plan)
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query has oracle SQL or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.forall(SparkEntry.rowsOnlyQueries.contains),
      s"queries without oracle or rows-only registration: $missing")
  }
}
