package graft

/** Plan-level scale invariant over the WHOLE query surface: no registered
  * query may plan a `CartesianProduct` — the non-broadcast cross join whose
  * cost is |L|·|R| rows shuffled, the classic silent 100 TB killer. Every
  * intentional cross join in the engine broadcasts its small side
  * (`BroadcastNestedLoopJoin` with a bounded build), which this guard
  * deliberately permits.
  *
  * Queries that execute eagerly when constructed (streaming runs, lake
  * round-trips) are cheap at sf0.001 and their returned frames still expose
  * a plan, so the sweep covers all of `SparkEntry.queries`.
  */
class PlanGuardSpec extends SparkSpec {

  test("no registered query plans a non-broadcast CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    offenders shouldBe empty
  }
}
