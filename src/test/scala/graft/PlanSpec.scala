package graft

/** Physical-plan regression guards: the optimizer properties the 100 TB
  * story depends on, pinned as assertions so refactors can't silently
  * lose pushdown, pruning, or join strategy. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02 pushes compound predicates into the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:") && p.contains("In(o_orderstatus"))
  }

  test("q01 prunes the scan to the projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "unused column must not be read")
  }

  test("q12 forces broadcast-hash joins on the dimension chain") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q12_join_broadcast")).size >= 2)
  }

  test("q26 compiles to TakeOrderedAndProject (top-k, no full sort)") {
    assert(plan("q26_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q10 theta join uses broadcast nested loop (non-equi)") {
    assert(plan("q10_join_theta").contains("BroadcastNestedLoopJoin"))
  }

  test("q61 native as-of join plans AsOfJoinExec with two exchanges") {
    val p = plan("q61_asof_native")
    assert(p.contains("AsOfJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected exactly the two key-cluster exchanges:\n$p")
  }
}
