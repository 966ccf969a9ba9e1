package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integrity-engineering wave (round 10, seventy-eighth wave): Luhn
  * check digits with their detection guarantee, Zeller's congruence,
  * partition-balance economics, and Dorfman group testing.
  *
  * q467 protects every order key with a Luhn check digit (1954) and
  * then ATTACKS it: each key suffers a deterministic single-digit
  * corruption and a deterministic adjacent transposition, and the
  * classic guarantee is counted — single-digit errors are ALWAYS
  * caught, transpositions always except the 09↔90 pair, whose
  * occurrences are counted exactly and reconciled. q468 computes the
  * weekday by Zeller's congruence (1882) — pure date arithmetic,
  * h = (q + ⌊13(m+1)/5⌋ + K + ⌊K/4⌋ + ⌊J/4⌋ + 5J) mod 7 — and
  * certifies it equal to q343's days-since-known-Monday derivation
  * on EVERY order date (the reason both exist: engines disagree on
  * weekday builtins, so the engine-free forms must agree with each
  * other). q469 prices the three partitioning schemes on real keys:
  * hash (md5), range (exact-ntile cuts), round-robin (contiguous
  * ids) — max/min load and imbalance at e4, with range and
  * round-robin certified within ±1 of ideal (the exact NTILE
  * property) and hash's deviation measured, not modeled. q470 is
  * Dorfman pooled testing (1943): hash-pooled orders with a ~3 %
  * deterministic defect rate, two-stage test counts MEASURED for
  * pool sizes 4/8/16/32, best size emitted — the screening-
  * economics answer as data.
  */
object IntegrityTwoQueries {

  /** Luhn checksum of the digit string in column expression `e`
    * (Spark dialect): sum over digits right-to-left, doubling every
    * second one, 9-wrapping. Every string this query feeds it is
    * EXACTLY 10 digits (9-digit payload + check digit, preserved by
    * both attacks), so the sum unrolls to 10 codegen'd scalar terms —
    * position 11−i is digit i from the right — instead of the r10
    * interpreted fold that re-reversed the string per step (4 calls
    * per row × 10 boxed steps = 4.1 s of bench). */
  private def luhnSum(e: String): String =
    (1 to 10).map { i =>
      val d = s"cast(substring($e, ${11 - i}, 1) as bigint)"
      if (i % 2 == 1) d
      else s"(case when 2 * $d > 9 then 2 * $d - 9 else 2 * $d end)"
    }.mkString("(", " + ", ")")

  private def luhnSumD(e: String): String =
    s"""list_sum(list_transform(range(1, length($e) + 1), i ->
       |  CASE WHEN i % 2 = 1
       |    THEN CAST(substr(reverse($e), CAST(i AS INT), 1) AS BIGINT)
       |    ELSE (CASE WHEN 2 * CAST(substr(reverse($e), CAST(i AS INT), 1)
       |            AS BIGINT) > 9
       |      THEN 2 * CAST(substr(reverse($e), CAST(i AS INT), 1) AS BIGINT) - 9
       |      ELSE 2 * CAST(substr(reverse($e), CAST(i AS INT), 1) AS BIGINT)
       |      END)
       |  END))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G412: Luhn check digits, guarantee counted under attack ────────
    // Payload: the order key, zero-padded to 9 digits; check digit
    // c = (10 − S mod 10) mod 10 where S is the Luhn sum of the
    // payload shifted one position (appendix position parity).
    // Attacks (deterministic per key): flip digit at position
    // p1 = hash mod 9 to (d+1) mod 10; swap adjacent positions
    // p2, p2+1 with p2 = hash mod 8. A corruption is CAUGHT when the
    // protected string no longer validates.
    "q467_luhn_audit" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"))
        .withColumn("pay", expr("lpad(cast(k as string), 9, '0')"))
        // check digit: Luhn over payload+placeholder '0', then adjust
        .withColumn("s0", expr(luhnSum("concat(pay, '0')")))
        .withColumn("cd", expr("pmod(10L - pmod(s0, 10L), 10L)"))
        .withColumn("prot", expr("concat(pay, cast(cd as string))"))
        .withColumn("h", expr("md5_60(cast(k as string))"))
        // attack 1: single-digit bump at p1 (payload positions 1..9)
        .withColumn("p1", expr("cast(pmod(h, 9) + 1 as int)"))
        .withColumn("att1", expr(
          """concat(substring(prot, 1, p1 - 1),
            |  cast(pmod(cast(substring(prot, p1, 1) as bigint) + 1, 10)
            |    as string),
            |  substring(prot, p1 + 1))""".stripMargin))
        // attack 2: adjacent transposition at p2, p2+1
        .withColumn("p2", expr("cast(pmod(h div 16, 8) + 1 as int)"))
        .withColumn("att2", expr(
          """concat(substring(prot, 1, p2 - 1),
            |  substring(prot, p2 + 1, 1), substring(prot, p2, 1),
            |  substring(prot, p2 + 2))""".stripMargin))
        .withColumn("v1", expr(s"pmod(${luhnSum("att1")}, 10L)"))
        .withColumn("v2", expr(s"pmod(${luhnSum("att2")}, 10L)"))
        .withColumn("d1", expr("case when v1 != 0L then 1L else 0L end"))
        .withColumn("d2", expr("case when v2 != 0L then 1L else 0L end"))
        // the known blind spot: transposing '09' or '90' is invisible;
        // a no-op swap (equal digits) is not a corruption at all
        .withColumn("noop2", expr(
          "case when substring(prot, p2, 1) = substring(prot, p2 + 1, 1) " +
            "then 1L else 0L end"))
        .withColumn("blind2", expr(
          """case when (substring(prot, p2, 2) = '09'
            |        or substring(prot, p2, 2) = '90') then 1L else 0L end"""
            .stripMargin))
      o.agg(count(lit(1)).as("n"),
          sum(expr(s"case when pmod(${luhnSum("prot")}, 10L) = 0L " +
            "then 1L else 0L end")).as("n_valid"),
          sum("d1").as("n_caught_digit"),
          sum("d2").as("n_caught_transpose"),
          sum("noop2").as("n_noop_swaps"),
          sum("blind2").as("n_blind_0990"))
        .select(col("n"), col("n_valid"),
          expr("case when n_valid = n then 1L else 0L end").as("all_valid"),
          col("n_caught_digit"),
          expr("case when n_caught_digit = n then 1L else 0L end")
            .as("digit_guarantee_ok"),
          col("n_caught_transpose"), col("n_noop_swaps"), col("n_blind_0990"),
          expr("case when n_caught_transpose = n - n_noop_swaps - n_blind_0990 " +
            "then 1L else 0L end").as("transpose_guarantee_ok"))
    }),

    // ── G413: Zeller's congruence ≡ days-since-Monday, everywhere ──────
    "q468_zeller" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("d")).distinct()
        .withColumn("yy", expr("year(d)")).withColumn("mm", expr("month(d)"))
        .withColumn("qq", expr("day(d)"))
        // Zeller: Jan/Feb count as months 13/14 of the previous year
        .withColumn("zm", expr("case when mm <= 2 then mm + 12 else mm end"))
        .withColumn("zy", expr("case when mm <= 2 then yy - 1 else yy end"))
        .withColumn("kk", expr("zy % 100")).withColumn("jj", expr("zy div 100"))
        .withColumn("h", expr(
          "pmod(qq + (13 * (zm + 1)) div 5 + kk + kk div 4 + jj div 4 + 5 * jj, 7)"))
        // Zeller h: 0=Saturday..6=Friday → days-since-Monday = (h+5) mod 7
        .withColumn("zeller_dow", expr("pmod(h + 5, 7)"))
        .withColumn("anchor_dow", expr(
          "pmod(cast(datediff(d, to_date('1970-01-05')) as bigint), 7)"))
      o.agg(count(lit(1)).as("n_dates"),
          sum(expr("case when zeller_dow != anchor_dow then 1L else 0L end"))
            .as("n_mismatch"),
          min("d").as("first_date"), max("d").as("last_date"))
        .withColumn("agree", expr(
          "case when n_mismatch = 0L then 1L else 0L end"))
    }),

    // ── G414: partition-balance economics (hash vs range vs RR) ────────
    "q469_partition_balance" -> ((s, dir) => {
      val P = 32
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      val n = o.agg(count(lit(1)).as("n_total"))
      val hash = o.withColumn("pt", expr(s"pmod(md5_60(cast(k as string)), $P)"))
        .groupBy("pt").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), min("c").as("mn"))
        .select(lit("1_hash").as("scheme"), col("mx"), col("mn"))
      val rng = graft.ops.Relational
        .distributedNtile(o, Seq(col("v"), col("k")), P, n, "bucket")
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), min("c").as("mn"))
        .select(lit("2_range").as("scheme"), col("mx"), col("mn"))
      val rr = graft.ops.Relational
        .contiguousIds(o.repartitionByRange(P, col("k"))
          .sortWithinPartitions("k"), "rid")
        .withColumn("pt", expr(s"pmod(rid, $P)"))
        .groupBy("pt").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), min("c").as("mn"))
        .select(lit("3_roundrobin").as("scheme"), col("mx"), col("mn"))
      hash.unionByName(rng).unionByName(rr)
        .crossJoin(broadcast(n))
        .select(col("scheme"), col("n_total"), col("mx").as("max_load"),
          col("mn").as("min_load"),
          expr(s"(mx - mn) * 10000 div (n_total div $P)").as("imbalance_e4"),
          expr(s"""case when scheme != '1_hash'
                  |  then (case when mx - mn <= 1 then 1L else 0L end)
                  |  else 1L end""".stripMargin).as("exactness_ok"))
        .orderBy("scheme")
    }),

    // ── G415: Dorfman group testing, pool-size sweep ───────────────────
    // Defect iff md5 mod 33 = 0 (~3 %). Pools by key hash (a DIFFERENT
    // hash slice so pooling is independent of defects). Stage-1 =
    // one test per pool; stage-2 = pool size more tests for every
    // positive pool. Tests counted exactly per k ∈ {4, 8, 16, 32}.
    "q470_group_testing" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"))
        .withColumn("h", expr("md5_60(cast(k as string))"))
        .withColumn("h2", expr("md5_60(concat('pool:', cast(k as string)))"))
        .withColumn("defect", expr(
          "case when pmod(h, 33) = 0 then 1L else 0L end"))
      // exact ps-sized pools from the hash-ordered contiguous rank —
      // the pool hash (h2) is a different md5 slice than the defect
      // hash, so pooling stays independent of defectiveness
      val ranked = graft.ops.Relational.contiguousIds(
        o.repartitionByRange(32, col("h2"), col("k"))
          .sortWithinPartitions("h2", "k"), "rid")
      val arms = Seq(4, 8, 16, 32).map { ps =>
        ranked.withColumn("pool", expr(s"rid div $ps"))
          .groupBy("pool")
          .agg(count(lit(1)).as("sz"), max("defect").as("pos"))
          .agg(count(lit(1)).as("n_pools"),
            sum("sz").as("n_items"),
            sum(expr("case when pos = 1L then sz else 0L end"))
              .as("stage2_tests"))
          .select(lit(ps.toLong).as("pool_target"), col("n_pools"),
            col("n_items"),
            expr("n_pools + stage2_tests").as("tests_used"))
      }
      val base = arms.reduce(_ unionByName _)
      base
        .withColumn("tests_per_item_e4", expr(
          "tests_used * 10000 div n_items"))
        .withColumn("saves_vs_individual", expr(
          "case when tests_used < n_items then 1L else 0L end"))
        .select("pool_target", "n_pools", "n_items", "tests_used",
          "tests_per_item_e4", "saves_vs_individual")
        .orderBy("pool_target")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q467_luhn_audit" -> {
      val lp = luhnSumD("prot")
      val l1 = luhnSumD("att1")
      val l2 = luhnSumD("att2")
      s"""WITH o AS (SELECT o_orderkey AS k,
        |    lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS pay,
        |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM orders),
        |cd AS (SELECT *, (10 - (${luhnSumD("(pay || '0')")}) % 10) % 10
        |    AS cdig FROM o),
        |pr AS (SELECT *, pay || CAST(cdig AS VARCHAR) AS prot,
        |    CAST(h % 9 + 1 AS INT) AS p1,
        |    CAST((h // 16) % 8 + 1 AS INT) AS p2
        |  FROM cd),
        |att AS (SELECT *,
        |    substr(prot, 1, p1 - 1)
        |      || CAST((CAST(substr(prot, p1, 1) AS BIGINT) + 1) % 10
        |         AS VARCHAR)
        |      || substr(prot, p1 + 1) AS att1,
        |    substr(prot, 1, p2 - 1) || substr(prot, p2 + 1, 1)
        |      || substr(prot, p2, 1) || substr(prot, p2 + 2) AS att2
        |  FROM pr),
        |sc AS (SELECT *,
        |    CASE WHEN ($l1) % 10 != 0 THEN 1 ELSE 0 END AS d1,
        |    CASE WHEN ($l2) % 10 != 0 THEN 1 ELSE 0 END AS d2,
        |    CASE WHEN substr(prot, p2, 1) = substr(prot, p2 + 1, 1)
        |      THEN 1 ELSE 0 END AS noop2,
        |    CASE WHEN substr(prot, p2, 2) IN ('09', '90') THEN 1 ELSE 0 END
        |      AS blind2,
        |    CASE WHEN ($lp) % 10 = 0 THEN 1 ELSE 0 END AS ok0
        |  FROM att)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(ok0) AS BIGINT) AS n_valid,
        |  CAST(CASE WHEN SUM(ok0) = COUNT(*) THEN 1 ELSE 0 END AS BIGINT)
        |    AS all_valid,
        |  CAST(SUM(d1) AS BIGINT) AS n_caught_digit,
        |  CAST(CASE WHEN SUM(d1) = COUNT(*) THEN 1 ELSE 0 END AS BIGINT)
        |    AS digit_guarantee_ok,
        |  CAST(SUM(d2) AS BIGINT) AS n_caught_transpose,
        |  CAST(SUM(noop2) AS BIGINT) AS n_noop_swaps,
        |  CAST(SUM(blind2) AS BIGINT) AS n_blind_0990,
        |  CAST(CASE WHEN SUM(d2) = COUNT(*) - SUM(noop2) - SUM(blind2)
        |    THEN 1 ELSE 0 END AS BIGINT) AS transpose_guarantee_ok
        |FROM sc""".stripMargin
    },

    "q468_zeller" ->
      """WITH d0 AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |z AS (SELECT d,
        |    CASE WHEN month(d) <= 2 THEN month(d) + 12 ELSE month(d) END AS zm,
        |    CASE WHEN month(d) <= 2 THEN year(d) - 1 ELSE year(d) END AS zy,
        |    day(d) AS qq
        |  FROM d0),
        |h AS (SELECT d,
        |    ((qq + (13 * (zm + 1)) // 5 + zy % 100 + (zy % 100) // 4
        |      + (zy // 100) // 4 + 5 * (zy // 100)) % 7 + 5) % 7 AS zdow,
        |    ((date_diff('day', DATE '1970-01-05', d) % 7) + 7) % 7 AS adow
        |  FROM z)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_dates,
        |  CAST(SUM(CASE WHEN zdow != adow THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatch,
        |  MIN(d) AS first_date, MAX(d) AS last_date,
        |  CAST(CASE WHEN SUM(CASE WHEN zdow != adow THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS agree
        |FROM h""".stripMargin,

    "q469_partition_balance" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |n AS (SELECT COUNT(*) AS n_total FROM o),
        |hash AS (SELECT '1_hash' AS scheme, MAX(c) AS mx, MIN(c) AS mn
        |  FROM (SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 32 AS pt, COUNT(*) AS c FROM o GROUP BY 1) z),
        |rngc AS (SELECT '2_range' AS scheme, MAX(c) AS mx, MIN(c) AS mn
        |  FROM (SELECT b, COUNT(*) AS c FROM (
        |    SELECT NTILE(32) OVER (ORDER BY v, k) AS b FROM o) zz
        |    GROUP BY b) z3),
        |rr AS (SELECT '3_roundrobin' AS scheme, MAX(c) AS mx, MIN(c) AS mn
        |  FROM (SELECT rn % 32 AS pt, COUNT(*) AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY k) AS rn FROM o) zr
        |    GROUP BY 1) z4)
        |SELECT u.scheme, CAST(n.n_total AS BIGINT) AS n_total,
        |  CAST(u.mx AS BIGINT) AS max_load, CAST(u.mn AS BIGINT) AS min_load,
        |  CAST((u.mx - u.mn) * 10000 // (n.n_total // 32) AS BIGINT)
        |    AS imbalance_e4,
        |  CAST(CASE WHEN u.scheme != '1_hash'
        |    THEN (CASE WHEN u.mx - u.mn <= 1 THEN 1 ELSE 0 END)
        |    ELSE 1 END AS BIGINT) AS exactness_ok
        |FROM (SELECT * FROM hash UNION ALL SELECT * FROM rngc
        |      UNION ALL SELECT * FROM rr) u, n
        |ORDER BY u.scheme""".stripMargin,

    "q470_group_testing" -> {
      val arms = Seq(4, 8, 16, 32).map { ps =>
        s"""SELECT $ps::BIGINT AS pool_target,
           |  CAST(COUNT(*) AS BIGINT) AS n_pools,
           |  CAST(SUM(sz) AS BIGINT) AS n_items,
           |  CAST(COUNT(*) + SUM(CASE WHEN pos = 1 THEN sz ELSE 0 END)
           |    AS BIGINT) AS tests_used
           |FROM (SELECT rid // $ps AS pool,
           |    COUNT(*) AS sz, MAX(defect) AS pos
           |  FROM ranked GROUP BY 1) p$ps""".stripMargin
      }.mkString("\n        UNION ALL\n")
      s"""WITH o AS (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h,
        |    CAST('0x' || substr(md5('pool:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS h2,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 33 = 0 THEN 1 ELSE 0 END AS defect
        |  FROM orders),
        |ranked AS (SELECT defect,
        |    ROW_NUMBER() OVER (ORDER BY h2, k) - 1 AS rid FROM o),
        |base AS (
        |$arms)
        |SELECT pool_target, n_pools, n_items, tests_used,
        |  CAST(tests_used * 10000 // n_items AS BIGINT) AS tests_per_item_e4,
        |  CAST(CASE WHEN tests_used < n_items THEN 1 ELSE 0 END AS BIGINT)
        |    AS saves_vs_individual
        |FROM base ORDER BY pool_target""".stripMargin
    }
  )
}
