package graft.queries

import graft.SparkSpec

/** Catch-all plan hygiene over the ENTIRE query inventory: no query may
  * plan a cartesian product or nested-loop join unless it is one by
  * definition — the class of regression that stays invisible at sf0.01
  * and detonates at 100 TB.
  *
  * Rather than allowlisting every query that uses the canonical one-row
  * `crossJoin(broadcast(<ungrouped aggregate>))` scalar attach (25+ of
  * them and growing), the spec inspects the OPTIMIZED LOGICAL plan: a
  * join is only an offender when it is cross/non-equi AND neither side
  * is provably single-row (`maxRows <= 1` — an Aggregate with no
  * grouping expressions, however projected/filtered above it). A
  * single-row build side is O(rows) work at any scale; a multi-row
  * cartesian is the 100 TB detonator this spec exists to catch. */
class PlanHygieneSpec extends SparkSpec {

  // deliberate exceptions that really do cartesian multi-row sides:
  // join_cross IS the cross-join demonstration query.
  private val allowCartesian = Set("join_cross")

  private def riskyCrossJoins(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    // top-level AND conjuncts only: an EqualTo buried under an OR (e.g.
    // `a = b OR x < y`) does NOT bound the join — it still enumerates
    // pairs — so it must not count as an equi-condition
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    plan.collect {
      case j: LJoin =>
        val singleRowSide = Seq(j.left, j.right).exists(_.maxRows.exists(_ <= 1L))
        // at least one top-level conjunct must equate an expression over
        // the left side with one over the right side (either orientation)
        val leftOut = j.left.outputSet
        val rightOut = j.right.outputSet
        def across(a: Expression, b: Expression): Boolean =
          a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut)
        val hasEquiCond = j.condition.exists(c => conjuncts(c).exists {
          case EqualTo(a, b) => across(a, b) || across(b, a)
          case _             => false
        })
        if (!singleRowSide && !hasEquiCond)
          Some(s"${j.joinType} join with no equi-condition and no single-row side")
        else None
    }.flatten
  }

  test("no accidental cartesian/nested-loop joins across the inventory") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (allowCartesian(name)) None
        else {
          val verdict =
            try {
              val qe = fn(spark, sf).queryExecution
              val physical =
                qe.explainString(org.apache.spark.sql.execution.SimpleMode)
              if (physical.contains("CartesianProduct") ||
                physical.contains("BroadcastNestedLoopJoin")) {
                // physical nested-loop present: only an offender when the
                // logical plan shows a cross/non-equi join of multi-row sides
                val risky = riskyCrossJoins(qe.optimizedPlan)
                if (risky.nonEmpty) Some(risky.mkString("; ")) else None
              } else None
            } catch { case e: Throwable => Some(s"BUILD FAILED: ${e.getMessage}".take(120)) }
          verdict.map(name -> _)
        }
    }
    assert(offenders.isEmpty, offenders.map { case (n, w) => s"$n: $w" }.mkString("\n"))
  }
}
