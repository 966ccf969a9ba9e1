package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic-algorithms wave (round 10, sixty-eighth wave): Morris
  * approximate counting, the NULL-semantics parity matrix, weighted
  * interval scheduling by exact DP, and Huffman coding economics.
  *
  * Reference intent: the reference counts everything exactly and
  * small (Postgres aggregates in services/training-service/app/
  * db_utils.py), encodes nothing, and schedules nothing — the four
  * primitives here are what the same workload needs at 10⁹ keys.
  * q445 is Morris's 1978 approximate counter — the first streaming
  * algorithm — run 8-way per user with deterministic hash coins
  * (increment counter C when md5 mod 2^C = 0; estimate 2^C − 1),
  * salt-averaged, and priced against the exact count per user
  * (q403's held-out-scoreboard discipline: the estimator pays in
  * disclosed error, ~±35 % at these counts). q446 pins the NULL
  * algebra both engines must agree on — aggregate null-skipping,
  * all-NULL groups, NULL group keys, three-valued IN, null-safe
  * equality, empty-set aggregates — as a long-format check matrix;
  * the one true DIVERGENCE (Spark collect_list drops NULLs, DuckDB
  * list() keeps them) is resolved by the portable filter-first form
  * and documented here. q447 solves weighted interval scheduling
  * exactly per customer (sort by end; dp_i = max(dp_{i−1}, w_i +
  * dp_{p(i)})) and certifies dominance over q414's earliest-end
  * greedy — the textbook case where greedy is optimal for COUNT but
  * not for WEIGHT. q448 builds a Huffman code (1952) over the corpus
  * vocabulary by folding the two-minimum merge k−1 times (depth of a
  * symbol = number of merges containing it), certifies the Kraft
  * EQUALITY Σ2^(D−d_s) = 2^D that every complete prefix code must
  * satisfy (exact shiftlefts, q422's rule — never a float pow), and
  * prices the code against fixed-width.
  */
object AlgorithmQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G390: Morris approximate counters, 8-way salted ────────────────
    // Per user, each event flips 8 deterministic coins (one per
    // salt): counter C_r increments iff md5_60(u:us:eid:r) mod 2^C_r
    // = 0 — exactly Morris's probability-2^{-C} rule with the hash as
    // the coin. Per-user estimate = mean over salts of (2^C − 1),
    // floor-div 8. The scoreboard: exact n per user is known, so the
    // mean absolute relative error ACROSS users is emitted at e4,
    // plus the worst user. The whole fold is one groupBy + HOF —
    // the shape that compresses 10⁹ per-key counters into bytes.
    "q445_morris_counter" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
      val perUser = ev.groupBy("u")
        .agg(expr("array_sort(collect_list(struct(us, eid)))").as("xs"),
          count(lit(1)).as("n_u"))
        .withColumn("cs", expr(
          """aggregate(xs, array_repeat(0L, 8),
            |  (acc, z) -> transform(acc, (c, r) ->
            |    c + (case when pmod(md5_60(concat(cast(u as string), ':',
            |      cast(z.us as string), ':', cast(z.eid as string), ':',
            |      cast(r as string))), shiftleft(1L, cast(c as int))) = 0L
            |    then 1L else 0L end)))""".stripMargin))
        .withColumn("est", expr(
          "aggregate(cs, 0L, (a, c) -> a + shiftleft(1L, cast(c as int)) - 1L) div 8"))
        .withColumn("abs_err", abs(col("est") - col("n_u")))
      perUser.agg(
          count(lit(1)).as("n_users"), sum("n_u").as("n_exact"),
          sum("est").as("n_est_sum"),
          sum(expr("abs_err * 10000 div n_u")).as("rel_err_sum_e4"),
          max(expr("abs_err * 10000 div n_u")).as("worst_rel_err_e4"),
          min("est").as("est_min"), max("est").as("est_max"))
        .select(col("n_users"), col("n_exact"), col("n_est_sum"),
          expr("rel_err_sum_e4 div n_users").as("mean_rel_err_e4"),
          col("worst_rel_err_e4"), col("est_min"), col("est_max"),
          expr("(n_est_sum - n_exact) * 10000 div n_exact")
            .as("total_bias_e4"))
    }),

    // ── G391: NULL-semantics parity matrix ─────────────────────────────
    // NULLs injected deterministically into orders (price NULL at
    // hash slot 0 of 7, priority NULL at slot 1 of 11). The battery,
    // long-format (check, value): aggregate skipping (count(*) vs
    // count(col)), all-NULL groups yielding NULL sums (counted via
    // the surviving-NULL count), NULL group keys forming ONE group,
    // three-valued IN (x IN (…) evaluating to NULL when x is NULL —
    // counted as neither true nor false), null-safe equality, and
    // the empty-set sum (NULL, not 0). Spark's collect_list DROPS
    // NULLs while DuckDB's list() KEEPS them — the portable form
    // filters first, and both arms are measured to the same number
    // here by construction.
    "q446_null_matrix" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("okey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents0"),
          col("o_orderpriority").as("pri0"))
        .withColumn("cents", expr(
          "case when pmod(md5_60(cast(okey as string)), 7) = 0 " +
            "then cast(null as bigint) else cents0 end"))
        .withColumn("pri", expr(
          "case when pmod(md5_60(cast(okey as string)), 11) = 1 " +
            "then cast(null as string) else pri0 end"))
      val checks = o.agg(
        count(lit(1)).as("c01_count_star"),
        count(col("cents")).as("c02_count_col"),
        countDistinct(col("pri")).as("c03_count_distinct_skips_null"),
        sum(expr("case when cents is null then 1L else 0L end"))
          .as("c04_nulls_injected"),
        sum(expr("case when pri is null then 1L else 0L end"))
          .as("c05_pri_nulls"),
        coalesce(sum(expr("case when 1 = 0 then cents end")), lit(-1L))
          .as("c06_empty_sum_is_null"),
        sum(expr("case when (cents = cents) is null then 1L else 0L end"))
          .as("c07_null_eq_null_is_null"),
        sum(expr("case when cents <=> cents then 1L else 0L end"))
          .as("c08_nullsafe_eq_true_all"),
        sum(expr("case when pri in ('1-URGENT', '2-HIGH') then 1L else 0L end"))
          .as("c09_in_true"),
        sum(expr("case when (pri in ('1-URGENT', '2-HIGH')) is null " +
          "then 1L else 0L end")).as("c10_in_null_neither"),
        min(col("cents")).as("c11_min_skips_null"),
        sum(expr("case when coalesce(cents, 0L) = 0L then 1L else 0L end"))
          .as("c12_coalesce_zero"),
        sum(expr("case when nullif(pri0, '5-LOW') is null then 1L else 0L end"))
          .as("c13_nullif"))
      val grp = o.groupBy("pri").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("c14_null_key_is_one_group"),
          sum(expr("case when pri is null then cnt else 0L end"))
            .as("c15_null_group_size"))
      // portable array form: filter nulls BEFORE collecting — both
      // engines then agree on the length (Spark would drop, DuckDB
      // would keep)
      val arr = o.filter(col("cents").isNotNull)
        .agg(size(collect_list(col("cents"))).cast("long")
          .as("c16_collected_nonnull"))
      val wide = checks.crossJoin(broadcast(grp)).crossJoin(broadcast(arr))
      val names = Seq("c01_count_star", "c02_count_col",
        "c03_count_distinct_skips_null", "c04_nulls_injected",
        "c05_pri_nulls", "c06_empty_sum_is_null",
        "c07_null_eq_null_is_null", "c08_nullsafe_eq_true_all",
        "c09_in_true", "c10_in_null_neither", "c11_min_skips_null",
        "c12_coalesce_zero", "c13_nullif", "c14_null_key_is_one_group",
        "c15_null_group_size", "c16_collected_nonnull")
      wide.select(explode(arrays_zip(
          array(names.map(lit): _*),
          array(names.map(col): _*))).as("z"))
        .select(expr("z.`0`").as("check"), expr("z.`1`").as("value"))
        .orderBy("check")
    }),

    // ── G392: weighted interval scheduling (exact DP vs greedy) ────────
    // Per customer: intervals = order spans (start = order date, end
    // = last ship date folded up to start, weight = order cents).
    // Closed intervals conflict when they SHARE a day, so
    // compatibility is end_j < start_i (strict) — which also
    // guarantees every predecessor sorts strictly earlier by end, so
    // the DP never reads a slot it hasn't written. p(i) = #
    // compatible predecessors via an in-array filter over the sorted
    // end list; dp as a growing array fold; OPT = last slot. The
    // earliest-end greedy (optimal for COUNT, q414) runs beside it
    // on weights and the DP's dominance is certified per customer —
    // never assumed.
    "q447_weighted_intervals" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("okey"))
        .agg(max(to_date(col("l_shipdate"))).as("e0"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("okey"), col("o_custkey").as("c"),
          to_date(col("o_orderdate")).as("st"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("w"))
      val iv = o.join(li, Seq("okey"))
        .select(col("c"), col("okey"),
          expr("cast(datediff(st, to_date('1990-01-01')) as bigint)").as("sd"),
          expr("cast(datediff(greatest(e0, st), to_date('1990-01-01')) as bigint)")
            .as("ed"), col("w"))
      // spreadCompute: the O(n²)-per-customer DP below sits on a
      // byte-tiny collected frame AQE coalesces to one task
      val perC = graft.ops.Relational.spreadCompute(
        iv.groupBy("c")
          .agg(expr("array_sort(collect_list(struct(ed, okey, sd, w)))").as("xs"),
            count(lit(1)).as("n_iv"), sum("w").as("w_total")))
        // p(i): count of intervals with end < start_i (ends pre-sorted)
        .withColumn("ends", expr("transform(xs, z -> z.ed)"))
        .withColumn("dp", expr(
          """aggregate(xs, array(0L),
            |  (acc, z) -> concat(acc, array(greatest(
            |    element_at(acc, size(acc)),
            |    z.w + element_at(acc,
            |      cast(size(filter(ends, e -> e < z.sd)) as int) + 1)))))"""
            .stripMargin))
        .withColumn("opt", expr("element_at(dp, size(dp))"))
        // earliest-end greedy on the same intervals, weights tallied
        .withColumn("gr", expr(
          """aggregate(xs, named_struct('last', -1000000L, 'v', 0L, 'k', 0L),
            |  (acc, z) -> case when z.sd > acc.last
            |    then named_struct('last', z.ed, 'v', acc.v + z.w,
            |                      'k', acc.k + 1L)
            |    else acc end)""".stripMargin))
        .select(col("c"), col("n_iv"), col("w_total"), col("opt"),
          expr("gr.v").as("greedy_w"), expr("gr.k").as("greedy_k"),
          expr("md5_60(concat(cast(c as string), ':', cast(opt as string)))")
            .as("rc"))
      perC.agg(
          count(lit(1)).as("n_customers"), sum("n_iv").as("n_intervals"),
          sum("opt").as("opt_total"), sum("greedy_w").as("greedy_total"),
          sum(expr("case when opt < greedy_w then 1L else 0L end"))
            .as("n_dp_below_greedy"),
          sum(expr("case when opt > greedy_w then 1L else 0L end"))
            .as("n_dp_strictly_better"),
          sum(expr("case when opt > w_total then 1L else 0L end"))
            .as("n_over_total"),
          expr("bit_xor(rc)").as("xor60_opt"))
        .withColumn("lift_e4", expr(
          "(opt_total - greedy_total) * 10000 div greedy_total"))
        .select("n_customers", "n_intervals", "opt_total", "greedy_total",
          "lift_e4", "n_dp_strictly_better", "n_dp_below_greedy",
          "n_over_total", "xor60_opt")
    }),

    // ── G393: Huffman code economics over the corpus vocabulary ────────
    // Symbols = distinct tokens with corpus frequencies, indexed
    // lexicographically (the deterministic tie-break: nodes compare
    // by (freq, smallest member index)). The fold keeps the node
    // list SORTED as an invariant — each of the k−1 steps merges the
    // two head nodes, adds +1 depth to every symbol they contain,
    // and re-sorts once. Depth(s) = number of merges containing s —
    // no tree ever materializes. Certificates: Kraft EQUALITY
    // Σ 2^(D−d_s) = 2^D (complete prefix codes, exact shiftleft),
    // and huffman_bits ≤ fixed_bits = n·⌈log₂k⌉ (⌈log₂k⌉ =
    // length(bin(k−1)), never a float log — q422's rule). The whole
    // computation is vocabulary-grain after one token scan.
    "q448_huffman" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val freq = Tables.documents(s, dir)
        .select(explode(tokens(lower(col("text")))).as("tok"))
        .filter(col("tok").rlike("^[a-z]+$"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
      val packed = freq.orderBy("tok")
        .agg(expr("collect_list(struct(tok, f))").as("sf0"),
          count(lit(1)).as("k"), sum("f").as("n_tokens"))
        // re-sort lexicographically (collect after orderBy is not a
        // contract) and index symbols 1..k
        .withColumn("sf", expr("array_sort(sf0)"))
        .withColumn("syms", expr("transform(sf, z -> z.tok)"))
        .withColumn("nodes0", expr(
          "array_sort(transform(sequence(1, cast(k as int)), i -> " +
            "named_struct('f', sf[i - 1].f, 'mi', cast(i as long), " +
            "'idxs', array(cast(i as long)))))"))
        .withColumn("st", expr(
          """aggregate(sequence(2, cast(k as int)),
            |  named_struct('ns', nodes0,
            |               'd', transform(sequence(1, cast(k as int)), i -> 0L)),
            |  (acc, step) -> named_struct(
            |    'ns', array_sort(concat(
            |      slice(acc.ns, 3, greatest(size(acc.ns) - 2, 0)),
            |      array(named_struct(
            |        'f', element_at(acc.ns, 1).f + element_at(acc.ns, 2).f,
            |        'mi', least(element_at(acc.ns, 1).mi,
            |                    element_at(acc.ns, 2).mi),
            |        'idxs', concat(element_at(acc.ns, 1).idxs,
            |                       element_at(acc.ns, 2).idxs))))),
            |    'd', transform(acc.d, (dv, i) -> dv +
            |      (case when array_contains(element_at(acc.ns, 1).idxs,
            |              cast(i + 1 as long))
            |         or array_contains(element_at(acc.ns, 2).idxs,
            |              cast(i + 1 as long))
            |       then 1L else 0L end))))""".stripMargin))
        .withColumn("depths", expr("st.d"))
        .withColumn("maxd", expr("array_max(depths)"))
        .withColumn("mind", expr("array_min(depths)"))
        .withColumn("hbits", expr(
          "aggregate(zip_with(sf, depths, (z, dd) -> z.f * dd), 0L, (a, x) -> a + x)"))
        .withColumn("kraft", expr(
          """aggregate(transform(depths, dd ->
            |    shiftleft(1L, cast(maxd - dd as int))), 0L, (a, x) -> a + x)"""
            .stripMargin))
        .withColumn("fixw", expr("cast(length(bin(k - 1)) as bigint)"))
        .withColumn("rc", expr(
          """aggregate(zip_with(syms, depths, (t, dd) ->
            |    md5_60(concat(t, ':', cast(dd as string)))),
            |  0L, (a, x) -> a ^ x)""".stripMargin))
      packed.select(col("k"), col("n_tokens"),
          expr("n_tokens * fixw").as("fixed_bits"),
          col("hbits").as("huffman_bits"),
          expr("(n_tokens * fixw - hbits) * 10000 div (n_tokens * fixw)")
            .as("savings_e4"),
          col("mind").as("depth_min"), col("maxd").as("depth_max"),
          expr("case when kraft = shiftleft(1L, cast(maxd as int)) " +
            "then 1L else 0L end").as("kraft_ok"),
          col("rc").as("xor60_code"))
    })
  )

  def oracleSql: Map[String, String] = AlgorithmOracles.oracleSql
}
