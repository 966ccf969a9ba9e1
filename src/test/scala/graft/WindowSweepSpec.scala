package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LogicalWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape tripwire for the canonical 100-TB scale-killer: a
  * WindowExec with an empty partition spec funnels its ENTIRE input
  * through one task (Spark logs "No Partition Defined for Window
  * operation"). This sweep walks the optimized logical plan of every
  * declared query and fails if any unpartitioned Window survives,
  * unless either
  *   (a) a Limit sits below it in the same subtree — the post-limit
  *       rank-attachment discipline (q221/q253/q255: TakeOrdered the
  *       top-k FIRST, then rank the k survivors), or
  *   (b) the query is in the explicit allowlist below, each entry
  *       carrying the reason its window input is bounded by something
  *       other than corpus size (calendar span, resample count, file
  *       count, |event_type|…).
  * Any NEW unpartitioned window must either adopt (a), use the
  * scale-safe rewrites in ops/Relational (contiguousIds /
  * distributedNtile / prefixSum), or be consciously allowlisted here
  * with a size argument. Fixture-internal plans (materialized once via
  * cachedFixture) are not visible in the final plan; those were swept
  * by grep and rewritten in round 10 (IndexQueries vocab ids,
  * PathQueries part index).
  */
class WindowSweepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  /** Unpartitioned windows whose input is provably NOT corpus-shaped. */
  private val allow: Map[String, String] = Map(
    "q215_sweep_concurrency" -> "±1 delta table: ≤ 2 rows per observed day (calendar-span-bounded)",
    "q230_compaction_bins" -> "per-month row-count table (|months| rows)",
    "q233_linkage_weights" -> "2×2 agreement-pattern contingency (≤ 4 rows)",
    "q259_fair_share" -> "per-event-type demand table (|event types| rows)",
    "q238_bootstrap_ci" -> "100 resample means (fixed resample count)",
    "q211_range_layout" -> "per-file min/max metadata frame (|files| rows)",
    "q213_linear_interpolate" -> "dense daily spine (calendar-span-bounded)",
    "q185_skyline" -> "global staircase over per-partition skyline frontiers only (skyline merge identity prunes the corpus in a partition-LOCAL pass first)",
    "q273_neyman_allocation" -> "largest-remainder rank over the per-month stratum table (|months| rows, pre-aggregated)",
    "q430_littles_law" -> "±1 delta table: ≤ 2 rows per observed day (calendar-span-bounded, q215's shape)",
    "q431_burn_rate" -> "daily error-rate grain (calendar-span-bounded, ≤ |days| rows)",
    "q481_weighted_majority" -> "daily volume-direction grain (calendar-span-bounded, ≤ |days| rows)",
    "q561_bradley_terry" -> "final rank over the 4-row arm-strength table (|arms| rows, read from the 12-row win-matrix fixture)")

  test("no query plan runs an unpartitioned Window over unbounded input") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val allowHits = scala.collection.mutable.Set[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.foreach {
        case w: LogicalWindow if w.partitionSpec.isEmpty =>
          val limitedBelow = w.child.collectFirst {
            case _: GlobalLimit => (); case _: LocalLimit => ()
          }.isDefined
          if (allow.contains(name)) allowHits += name
          else if (!limitedBelow)
            offenders += s"$name: unpartitioned Window over non-limited input (${w.windowExpressions.map(_.name).mkString(",")})"
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"\nScale-killer windows found — rewrite via ops/Relational.{contiguousIds,distributedNtile,prefixSum}, " +
        s"post-limit ranks, or allowlist with a size argument:\n  ${offenders.mkString("\n  ")}")
    // keep the allowlist honest: an entry whose window was fixed must be removed
    val stale = allow.keySet -- allowHits
    assert(stale.isEmpty, s"stale allowlist entries (no unpartitioned window remains): $stale")
  }

  test("no bare Window.orderBy in src/main — use Relational.boundedGlobalRank") {
    // Source-level lint (VERDICT r13 "next" #5): the plan sweep above
    // only sees plans of DECLARED queries — a bare global window inside
    // a fixture builder or an undeclared helper is invisible to it.
    // Every intentional unpartitioned window must go through the named
    // helper, whose scaladoc states the boundedness contract, so a
    // future refactor cannot silently funnel a 100-TB table through
    // one sort task and so `grep boundedGlobalRank` enumerates every
    // consciously-global window in the engine.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("ops/Relational.scala")) // the helper itself
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala
        lines.zipWithIndex.collect {
          case (l, i) if l.contains("Window.orderBy(") => s"$p:${i + 1}: ${l.trim}"
        }
      }.toList
    assert(offenders.isEmpty,
      s"\nbare Window.orderBy sites (use graft.ops.Relational.boundedGlobalRank " +
        s"and state why the frame is bounded):\n  ${offenders.mkString("\n  ")}")
  }
}
