package graft

import org.apache.spark.sql.types.{ArrayType, FloatType, MapType}

/** Registry-WIDE invariants — one sweep over every query so a future
  * operator can't silently violate what the per-query specs pin locally:
  *
  *   1. No `CartesianProduct` in any physical plan. Every cross join in
  *      the engine is a deliberately-broadcast small side (1-row centroid
  *      arrays, query vectors, probe lists) which plans as
  *      `BroadcastNestedLoopJoin`; a `CartesianProduct` means two
  *      non-broadcast sides met — the one operator shape that cannot
  *      survive 100 TB under any partitioning.
  *   2. Oracled outputs obey the determinism contract (Registry scaladoc):
  *      no MapType (unordered stringification) and no raw float-array
  *      columns (per-engine formatting) in a column that DuckDB hashes.
  *
  * Building a plan executes the iterative builders (star contraction runs
  * its rounds at build time), so this suite runs at sf0.001.
  */
class RegistryHygieneSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("no registry query plans a CartesianProduct") {
    Registry.all.foreach { q =>
      val p = q.build(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.id} plans a CartesianProduct — a non-broadcast cross join:\n$p")
    }
  }

  test("no registry query funnels raw corpus rows through an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // The r3 i2 scale-killer, generalized to EVERY query: an
    // unpartitioned window whose input is not already aggregate-bounded
    // is a single-partition sort of the corpus. Exemptions are the
    // operators whose SEMANTICS are a global ranking over a base table
    // (d6's distribution analytics) — there the total order is the
    // deliverable, and the 100 TB form is rank-by-range-partition
    // (the e1 sort machinery), not a different plan for the same op.
    val globalBySemantics = Set("d6_window_distribution")
    Registry.all.filterNot(q => globalBySemantics(q.id)).foreach { q =>
      val wins = q.build(spark, dir).queryExecution.optimizedPlan
        .collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      wins.foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"${q.id}: unpartitioned window over non-aggregated input:\n$w")
      }
    }
  }

  test("oracled query outputs carry no MapType or float-array columns") {
    Registry.all.filter(_.oracle.nonEmpty).foreach { q =>
      q.build(spark, dir).schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[MapType],
          s"${q.id}.${f.name} is a MapType — unordered stringification breaks the hash gate")
        assert(f.dataType != ArrayType(FloatType, containsNull = true) &&
          f.dataType != ArrayType(FloatType, containsNull = false),
          s"${q.id}.${f.name} is a raw float array — per-engine float formatting breaks the hash gate")
      }
    }
  }
}
