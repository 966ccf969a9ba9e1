package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: filter a huge probe side against a small
  * build side WITHOUT shuffling the probe — ship a ~MB bloom filter of
  * the build keys to every probe task instead, then verify only the
  * might-contain survivors with an exact join.
  *
  * This is the decontamination join shape at 100 TB: the build side (an
  * eval-set blocklist, a takedown list) is millions of keys; the probe
  * side is the corpus. A plain semi/anti join shuffles the corpus on the
  * key; the bloom pass is a narrow map-side filter (zero shuffle, scan
  * stays in whole-stage codegen) that discards ~all rows, and only the
  * false-positive-rate fraction pays the exact join. Results are EXACT:
  * a bloom filter has no false negatives, so `might_contain = false`
  * rows are provably clean, and the exact join adjudicates the maybes.
  *
  * Spark's optimizer injects this same reduction on its own
  * (InjectRuntimeFilter) but only between shuffle stages of one query
  * and only under cost heuristics; these combinators make it a
  * deliberate operator so a pipeline can, e.g., build the blocklist
  * bloom once and apply it to every scan. Expressions are Spark's own
  * (BloomFilterAggregate / BloomFilterMightContain via
  * [[GraftColumnBridge]]) — codegen'd, spill-free, keyed on xxhash64.
  */
object Bloom {

  /** (mightContain predicate, exact build keys) for `keyCol` against
    * `build`'s `keyCol` values. The bloom is built by one aggregate over
    * the build side and reaches probe tasks as a scalar-subquery
    * broadcast.
    *
    * NULL-guarded: BloomFilterAggregate evaluates to NULL over an EMPTY
    * build side, and BloomFilterMightContain propagates that NULL — so
    * without the coalesce BOTH `pred` and `!pred` would drop every probe
    * row (an empty blocklist would silently discard the whole corpus).
    * An empty bloom contains nothing, so NULL coalesces to `false`. */
  private def bloomPredicate(build: DataFrame, keyCol: String,
                             expectedItems: Long) = {
    val bloomDf = build
      .select(GraftColumnBridge.bloomFilterAgg(xxhash64(col(keyCol)), expectedItems).as("bf"))
    coalesce(
      GraftColumnBridge.bloomMightContain(
        GraftColumnBridge.scalarSubquery(bloomDf), xxhash64(col(keyCol))),
      lit(false))
  }

  /** Rows of `probe` whose `keyCol` IS in `build` (exact semi join,
    * bloom-pruned): only might-contain survivors reach the verify join,
    * so the shuffle/broadcast carries the collision fraction of the
    * probe, not the probe. */
  def semiJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               expectedItems: Long = 1 << 20): DataFrame =
    probe.filter(bloomPredicate(build, keyCol, expectedItems))
      .join(build.select(keyCol).distinct(), Seq(keyCol), "left_semi")

  /** Rows of `probe` whose `keyCol` is NOT in `build` (exact anti join,
    * bloom-pruned): rows the bloom clears are kept outright (no false
    * negatives — no join needed); only the maybes pay the exact
    * anti join. The two branches are disjoint by the same predicate, so
    * their union is exactly the plain anti join's result. */
  def antiJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               expectedItems: Long = 1 << 20): DataFrame = {
    val mc = bloomPredicate(build, keyCol, expectedItems)
    probe.filter(!mc).unionByName(
      probe.filter(mc).join(build.select(keyCol).distinct(), Seq(keyCol), "left_anti"))
  }
}
