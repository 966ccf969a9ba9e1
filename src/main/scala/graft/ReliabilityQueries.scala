package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Survival-and-reliability subsystem (round 10, forty-fourth wave):
  * Kaplan–Meier repeat-purchase survival with REAL right-censoring,
  * discrete-time hazard buckets, the mean-residual-life ladder, and a
  * risk-pooling covariance audit.
  *
  * Reference intent: the reference forecasts WEEKLY sales per store
  * (services/training-service/app/train_utils.py:24-35) but never asks
  * the retention question behind the demand: how long until a customer
  * buys AGAIN, and when has one effectively churned? Time-to-repeat is
  * the canonical right-censored duration — every customer's LAST order
  * is an open interval cut off by the corpus end, and dropping those
  * rows (the naive mistake) biases survival DOWN. KM is the standard
  * estimator that uses them correctly.
  *
  * Integer discipline for a sequential estimator: the KM product
  * S ← S·(n−d)/n floors at e6 ONCE per event time — a genuinely
  * sequential recurrence, expressed as an aggregate() HOF fold over the
  * duration-GRAIN array (≤ calendar-span rows, collected once), with
  * state and elements packed into single BIGINTs so the identical
  * integer arithmetic runs verbatim in DuckDB's list_reduce (q284's
  * Croston precedent; the seed rides as a prepended list head there).
  * Packing widths (t·2⁴⁴ + d·2²² + c; state s_e6·2²² + n) bound
  * d, c, n < 2²² ≈ 4.2M subjects and t < 2¹⁹ days — right for every
  * verification scale; a 10⁹-subject production run swaps the packed
  * BIGINT for a struct-state fold on the Spark side (one-line change,
  * documented here) since nothing else depends on the packing.
  */
object ReliabilityQueries {

  private val P44 = 17592186044416L // 2^44
  private val P22 = 4194304L        // 2^22

  /** Durations table: one row per order — time in days to the SAME
    * customer's next order (ev = 1), or to the corpus max date for the
    * last order (ev = 0, right-censored). One corpus shuffle to
    * (customer) partitions; the lead window is customer-partitioned. */
  private def durations(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("cust"), to_date(col("o_orderdate")).as("d"),
        col("o_orderkey"))
    val mx = o.agg(max("d").as("maxd"))
    o.withColumn("nd", lead(col("d"), 1).over(
        Window.partitionBy("cust").orderBy(col("d").asc, col("o_orderkey").asc)))
      .crossJoin(broadcast(mx))
      .select(
        coalesce(datediff(col("nd"), col("d")), datediff(col("maxd"), col("d")))
          .cast(LongType).as("t"),
        when(col("nd").isNotNull, 1L).otherwise(0L).as("ev"))
  }

  /** Duration-grain census: (t, d events, c censored) — calendar-span
    * rows, the input every estimator here folds or scans. */
  private def grain(s: SparkSession, dir: String): DataFrame =
    durations(s, dir).groupBy("t")
      .agg(sum("ev").as("d"), sum(expr("1 - ev")).as("c"))

  /** Shared DuckDB mirror of [[durations]]/[[grain]]. */
  private val GrainCte =
    """o AS (SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d, o_orderkey
      |      FROM orders),
      |mx AS (SELECT MAX(d) AS maxd FROM o),
      |seq AS (SELECT cust, d, LEAD(d) OVER (PARTITION BY cust ORDER BY d, o_orderkey) AS nd
      |        FROM o),
      |dur AS (SELECT CAST(COALESCE(nd - d, (SELECT maxd FROM mx) - d) AS BIGINT) AS t,
      |               CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END AS ev
      |        FROM seq),
      |grain AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(SUM(1 - ev) AS BIGINT) AS c
      |          FROM dur GROUP BY t)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G294: Kaplan–Meier repeat-purchase survival ────────────────────
    // S(k) at a ladder of horizons: fold S ← S·(n−d) div n over event
    // times ≤ k, with n carried IN the fold state (n ← n − d − c), so
    // the at-risk series needs no separate prefix pass. Censored rows
    // shape the curve exactly the way KM prescribes: they shrink n
    // between event times without stepping S. Corpus work is ONE
    // customer-partitioned lead + one grain groupBy; each ladder fold
    // is calendar-span work on one collected array.
    "q349_kaplan_meier" -> ((s, dir) => {
      val packed = grain(s, dir)
        .agg(
          expr(s"array_sort(collect_list(t * $P44 + d * $P22 + c))").as("pk"),
          sum(expr("d + c")).as("n0"))
      val ladder = s.range(0, 8).select(
        expr("element_at(array(0L, 7L, 14L, 30L, 60L, 90L, 180L, 365L), cast(id + 1 as int))").as("k"))
      packed.crossJoin(broadcast(ladder))
        .withColumn("fold", expr(
          s"aggregate(filter(pk, x -> x div $P44 <= k), cast(1000000 as bigint) * $P22 + n0, " +
            s"(acc, x) -> (acc div $P22) * ((acc % $P22) - ((x div $P22) % $P22)) div (acc % $P22) * $P22" +
            s" + ((acc % $P22) - ((x div $P22) % $P22) - (x % $P22)))"))
        .withColumn("n_events_le_k", expr(
          s"aggregate(filter(pk, x -> x div $P44 <= k), 0L, (a, x) -> a + (x div $P22) % $P22)"))
        .select(col("k"),
          expr(s"fold div $P22").as("s_e6"),
          expr(s"fold % $P22").as("at_risk_after_k"),
          col("n_events_le_k"))
        .orderBy("k")
    }),

    // ── G295: discrete-time hazard by 30-day bucket ────────────────────
    // h(b) = events in bucket b over subjects AT RISK entering b
    // (N − everything resolved in earlier buckets), e6. The prefix over
    // the ≤ span/30 bucket rows is a triangular self-join on the
    // PRE-AGGREGATED bucket grain — no unpartitioned window anywhere.
    // The first rising-then-falling hazard bucket is where a churn
    // definition ("no order within X days") should put X.
    "q350_hazard_buckets" -> ((s, dir) => {
      val g30 = grain(s, dir).groupBy(expr("t div 30").as("b"))
        .agg(sum("d").as("d"), sum("c").as("c"))
      val tot = g30.agg(sum(expr("d + c")).as("n_total"))
      val prior = g30.as("a")
        .join(g30.as("p"), col("p.b") < col("a.b"), "left")
        .groupBy(col("a.b").as("b"), col("a.d").as("d"), col("a.c").as("c"))
        .agg(coalesce(sum(expr("p.d + p.c")), lit(0L)).as("resolved_before"))
      prior.crossJoin(broadcast(tot))
        .withColumn("at_risk", expr("n_total - resolved_before"))
        .withColumn("hazard_e6", expr("d * 1000000 div at_risk"))
        .select("b", "d", "c", "at_risk", "hazard_e6")
        .orderBy("b")
    }),

    // ── G296: mean-residual-life ladder ────────────────────────────────
    // MRL(k) = E[T − k | T > k] over OBSERVED gaps only (the censored
    // tail would need the KM integral; the observed-gap MRL is the
    // standard empirical form and the one a "days until next order"
    // dashboard shows). Exact: (Σ_{t>k} t·d − k·n_{>k}) div n_{>k}
    // from the duration grain — one conditional aggregate per ladder
    // point, zero windows.
    "q351_mean_residual_life" -> ((s, dir) => {
      val g = grain(s, dir)
      val ladder = s.range(0, 5).select(
        expr("element_at(array(0L, 30L, 60L, 90L, 180L), cast(id + 1 as int))").as("k"))
      g.crossJoin(broadcast(ladder))
        .groupBy("k")
        .agg(sum(when(col("t") > col("k"), col("d")).otherwise(0L)).as("n_gt"),
          sum(when(col("t") > col("k"), expr("t * d")).otherwise(0L)).as("st_gt"))
        .filter(col("n_gt") > 0)
        .withColumn("mrl_days", expr("(st_gt - k * n_gt) div n_gt"))
        .select("k", "n_gt", "mrl_days")
        .orderBy("k")
    }),

    // ── G297: risk-pooling covariance audit ────────────────────────────
    // Var(pooled regional demand) vs Σ per-nation variances: the gap IS
    // twice the pairwise covariance mass, and this audit computes BOTH
    // SIDES INDEPENDENTLY — pooled moments from region-day sums,
    // covariances from a nation-pair day join — so the exact integer
    // identity V_pool = Σ V_i + 2 Σ C_ij certifies the whole plan (all
    // terms D²-scaled: V = D·Σx² − (Σx)², C = D·Σxy − Σx·Σy). Cells
    // ride a dense calendar×nation spine (zero-demand days are real
    // observations). var_ratio_e4 = ΣV·10⁴ div V_pool < 10⁴ means
    // pooling helps; ≥ 10⁴ means positively correlated demand defeats
    // it — the number a multi-echelon inventory design starts from.
    "q352_risk_pooling" -> ((s, dir) => {
      val raw = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("d")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("r"), col("c_nationkey").as("nat"), col("d"))
        .agg(sum(expr("cast(l_quantity as bigint)")).as("q"))
      val span = raw.agg(min("d").as("d0"), max("d").as("d1"))
      val spine = Tables.nation(s, dir)
        .select(col("n_nationkey").as("nat"), col("n_regionkey").as("r"))
        .crossJoin(broadcast(span))
        .select(col("nat"), col("r"), explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      // localCheckpoint: five consumers below (day census, per-nation
      // variances, pooled, both covariance sides) — lazily each re-ran
      // the 3-table join + dense-spine build (guide §3.3)
      val cells = spine.join(raw, Seq("r", "nat", "d"), "left")
        .select(col("r"), col("nat"), col("d"), coalesce(col("q"), lit(0L)).as("q"))
        .localCheckpoint()
      val nDays = cells.groupBy("r", "nat").agg(count(lit(1)).as("dd"))
        .groupBy("r").agg(max("dd").as("dd")) // same span for every nation
      // per-nation variance terms, summed per region
      val perNat = cells.groupBy("r", "nat")
        .agg(count(lit(1)).as("dd"), sum("q").as("sx"), sum(expr("q * q")).as("sxx"))
        .groupBy("r")
        .agg(sum(expr("dd * sxx - sx * sx")).as("sum_v"), count(lit(1)).as("n_nations"))
      // pooled variance from region-day sums
      val pooled = cells.groupBy("r", "d").agg(sum("q").as("q"))
        .groupBy("r")
        .agg(count(lit(1)).as("dd"), sum("q").as("sx"), sum(expr("q * q")).as("sxx"))
        .select(col("r"), expr("dd * sxx - sx * sx").as("v_pool"))
      // pairwise covariances from the nation-pair day join (5 nations
      // per region → 10 pairs, day-grain cells — never corpus-shaped)
      val cov = cells.as("a")
        .join(cells.as("b"),
          col("a.r") === col("b.r") && col("a.d") === col("b.d") &&
            col("a.nat") < col("b.nat"))
        .groupBy(col("a.r").as("r"), col("a.nat").as("ni"), col("b.nat").as("nj"))
        .agg(count(lit(1)).as("dd"), sum(col("a.q")).as("sx"), sum(col("b.q")).as("sy"),
          sum(expr("a.q * b.q")).as("sxy"))
        .groupBy("r")
        .agg(sum(expr("dd * sxy - sx * sy")).as("sum_cov"))
      perNat.join(pooled, Seq("r")).join(cov, Seq("r")).join(nDays, Seq("r"))
        .select(col("r").cast(LongType).as("r"), col("n_nations"), col("dd").as("n_days"),
          col("v_pool"), col("sum_v"), col("sum_cov"))
        .withColumn("identity_gap", expr("v_pool - sum_v - 2 * sum_cov"))
        .withColumn("var_ratio_e4", expr("sum_v * 10000 div v_pool"))
        .orderBy("r")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q349_kaplan_meier" ->
      s"""WITH $GrainCte,
        |pk AS (SELECT list(t * $P44 + d * $P22 + c ORDER BY t) AS pk,
        |         SUM(d + c) AS n0
        |       FROM grain),
        |ladder AS (SELECT UNNEST([0, 7, 14, 30, 60, 90, 180, 365]) AS k),
        |folded AS (SELECT k,
        |    list_reduce(
        |      list_prepend(CAST(1000000 AS BIGINT) * $P22 + n0,
        |        list_filter(pk, x -> x // $P44 <= k)),
        |      (acc, x) -> (acc // $P22) * ((acc % $P22) - ((x // $P22) % $P22)) // (acc % $P22) * $P22
        |                  + ((acc % $P22) - ((x // $P22) % $P22) - (x % $P22))) AS fold,
        |    COALESCE(list_sum(list_transform(list_filter(pk, x -> x // $P44 <= k),
        |      x -> (x // $P22) % $P22)), 0) AS n_events_le_k
        |  FROM pk, ladder)
        |SELECT CAST(k AS BIGINT) AS k,
        |       CAST(fold // $P22 AS BIGINT) AS s_e6,
        |       CAST(fold % $P22 AS BIGINT) AS at_risk_after_k,
        |       CAST(n_events_le_k AS BIGINT) AS n_events_le_k
        |FROM folded ORDER BY k""".stripMargin,

    "q350_hazard_buckets" ->
      s"""WITH $GrainCte,
        |g30 AS (SELECT t // 30 AS b, SUM(d) AS d, SUM(c) AS c FROM grain GROUP BY 1),
        |tot AS (SELECT SUM(d + c) AS n_total FROM g30),
        |prior AS (SELECT a.b, a.d, a.c,
        |            COALESCE(SUM(p.d + p.c), 0) AS resolved_before
        |          FROM g30 a LEFT JOIN g30 p ON p.b < a.b
        |          GROUP BY a.b, a.d, a.c)
        |SELECT CAST(b AS BIGINT) AS b, CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
        |       CAST(n_total - resolved_before AS BIGINT) AS at_risk,
        |       CAST(d * 1000000 // (n_total - resolved_before) AS BIGINT) AS hazard_e6
        |FROM prior, tot ORDER BY b""".stripMargin,

    "q351_mean_residual_life" ->
      s"""WITH $GrainCte,
        |ladder AS (SELECT UNNEST([0, 30, 60, 90, 180]) AS k),
        |agg AS (SELECT k,
        |          SUM(CASE WHEN t > k THEN d ELSE 0 END) AS n_gt,
        |          SUM(CASE WHEN t > k THEN t * d ELSE 0 END) AS st_gt
        |        FROM grain, ladder GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_gt AS BIGINT) AS n_gt,
        |       CAST((st_gt - k * n_gt) // n_gt AS BIGINT) AS mrl_days
        |FROM agg WHERE n_gt > 0 ORDER BY k""".stripMargin,

    "q352_risk_pooling" ->
      """WITH raw AS (SELECT n_regionkey AS r, c_nationkey AS nat,
        |               CAST(o_orderdate AS DATE) AS d,
        |               SUM(CAST(l_quantity AS BIGINT)) AS q
        |             FROM lineitem
        |               JOIN orders ON l_orderkey = o_orderkey
        |               JOIN customer ON o_custkey = c_custkey
        |               JOIN nation ON c_nationkey = n_nationkey
        |             GROUP BY 1, 2, 3),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM raw),
        |spine AS (SELECT n_nationkey AS nat, n_regionkey AS r,
        |            CAST(UNNEST(generate_series(span.d0, span.d1, INTERVAL 1 DAY)) AS DATE) AS d
        |          FROM nation, span),
        |cells AS (SELECT spine.r, spine.nat, spine.d, COALESCE(raw.q, 0) AS q
        |          FROM spine LEFT JOIN raw
        |            ON spine.r = raw.r AND spine.nat = raw.nat AND spine.d = raw.d),
        |perNat AS (SELECT r, SUM(dd * sxx - sx * sx) AS sum_v, COUNT(*) AS n_nations
        |           FROM (SELECT r, nat, COUNT(*) AS dd, SUM(q) AS sx, SUM(q * q) AS sxx
        |                 FROM cells GROUP BY r, nat) z
        |           GROUP BY r),
        |pooled AS (SELECT r, dd * sxx - sx * sx AS v_pool, dd
        |           FROM (SELECT r, COUNT(*) AS dd, SUM(q) AS sx, SUM(q * q) AS sxx
        |                 FROM (SELECT r, d, SUM(q) AS q FROM cells GROUP BY r, d) y
        |                 GROUP BY r) z),
        |cov AS (SELECT r, SUM(dd * sxy - sx * sy) AS sum_cov
        |        FROM (SELECT a.r AS r, a.nat, b.nat AS natb, COUNT(*) AS dd,
        |                SUM(a.q) AS sx, SUM(b.q) AS sy, SUM(a.q * b.q) AS sxy
        |              FROM cells a JOIN cells b
        |                ON a.r = b.r AND a.d = b.d AND a.nat < b.nat
        |              GROUP BY a.r, a.nat, b.nat) z
        |        GROUP BY r)
        |SELECT CAST(perNat.r AS BIGINT) AS r,
        |       CAST(n_nations AS BIGINT) AS n_nations,
        |       CAST(dd AS BIGINT) AS n_days,
        |       CAST(v_pool AS BIGINT) AS v_pool,
        |       CAST(sum_v AS BIGINT) AS sum_v,
        |       CAST(sum_cov AS BIGINT) AS sum_cov,
        |       CAST(v_pool - sum_v - 2 * sum_cov AS BIGINT) AS identity_gap,
        |       CAST(sum_v * 10000 // v_pool AS BIGINT) AS var_ratio_e4
        |FROM perNat JOIN pooled ON perNat.r = pooled.r
        |  JOIN cov ON perNat.r = cov.r
        |ORDER BY r""".stripMargin
  )
}
