package graft

/** Smoke: every registered query runs at sf0.001 and returns a stable,
  * non-degenerate schema. The value-level gate is the DuckDB differential
  * (scripts/check.py / driver Verify) — this spec catches regressions that
  * break a query before the next differential run.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("oracle map only names registered queries") {
    val qs = Queries.queries.keySet
    assert(Queries.oracleSql.keySet.subsetOf(qs))
  }

  for ((name, fn, _) <- Queries.all) {
    test(s"$name runs and has columns") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // forces execution
    }
  }
}
