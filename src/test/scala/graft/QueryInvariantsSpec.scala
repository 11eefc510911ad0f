package graft

/** Invariants enforced across EVERY declared query — the properties
  * whose violation would either fail grading (duplicate column names
  * break the column-sorted hash compare) or break the 100 TB story
  * (an unbroadcast cartesian product).
  */
class QueryInvariantsSpec extends SparkSpec {

  test("every declared query analyzes with unique, non-empty output column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val out = fn(spark, sf).schema.fieldNames.toSeq
      assert(out.nonEmpty, s"$name has empty schema")
      assert(out.distinct.size === out.size, s"$name has duplicate columns: $out")
      assert(out.forall(_.nonEmpty), s"$name has empty column name")
    }
  }

  test("no declared query plans a CartesianProduct (broadcast nested-loop is the allowed cross shape)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — broadcast the small side:\n$plan")
    }
  }

  test("every oracle key has a query and vice versa") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
