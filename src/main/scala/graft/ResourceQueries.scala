package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resource-allocation wave (round 10, eighty-first wave): UCB1
  * curation-budget allocation, Hamming(7,4)+SECDED integrity, and
  * external merge-sort pass economics.
  *
  * q477 replays Auer et al.'s (2002) UCB1 as a curation-budget
  * allocator: 5 document sources are the arms, the reward of pulling
  * a source is whether its next hash-ordered doc is English (the
  * inspect-which-source-next decision every corpus triage loop
  * makes). The policy is fully deterministic — play each arm once,
  * then argmax of mean + sqrt(2·⌊log₂t⌋/n) with the log a pinned
  * integer CASE and the single allowed floor-sqrt (argument ≤ 1.4e13,
  * exact in double) — so the 256-step fold replays bit-equal in the
  * oracle's recursive CTE and in the driver spec. Rewards cycle when
  * an arm's capped array (first 256 docs per source — the rank filter
  * is the at-scale guard) is exhausted. q478 is the correction
  * counterpart of q467's Luhn detection: every order key's 4-bit hash
  * nibble is Hamming(7,4)-encoded, then attacked — one hash-chosen
  * single-bit flip (the syndrome IS the flipped position: corrected
  * count == n, certified) and one double flip (syndrome = f1 XOR f2,
  * certified arithmetically; the decoder always "corrects" to a
  * VALID-but-WRONG codeword — the famous (7,4) miscorrection, counted
  * at 100%), and the SECDED extension bit (overall parity) detects
  * every double instead of miscorrecting. q479 prices external merge
  * sort on the measured table: run formation + ⌈log_B R₀⌉ merge
  * passes, the fold replayed at ×1/×10³/×10⁶ design scales and fan-in
  * 2/8/64/512 — the memory-vs-IO tradeoff every shuffle sort makes,
  * in exact integers.
  */
object ResourceQueries {

  private val Arms = 5
  private val Pulls = 256

  // ⌊log₂ t⌋ for t ∈ [1, 512] as a pinned CASE — no float log in either
  // engine (q416's integer-semantics discipline); plain int literals
  // parse identically in both dialects
  private def flog2(t: String): String =
    "(case " + (9 to 0 by -1).map(k => s"when $t >= ${1 << k} then $k")
      .mkString(" ") + " end)"

  // UCB1 index of arm a at step t, e6 scale: mean + floor-sqrt bonus;
  // n/sm are dialect-specific state accessors, idiv the dialect's
  // integer division, sqrt the dialect's floor-sqrt wrapper
  private def ucbIdx(a: Int, n: Int => String, sm: Int => String,
                     t: String, idiv: String,
                     sqrt: String => String): String =
    s"(${sm(a)} * 1000000 $idiv ${n(a)} + " +
      sqrt(s"(2 * ${flog2(t)} * 1000000000000) $idiv ${n(a)}") + ")"

  // smallest-argmax over the 5 arm indexes (>= keeps the lower arm id,
  // exactly a left fold with strict >)
  private def argmax(idx: Int => String): String =
    "(case " + (1 until Arms).map(a =>
      s"when ${(a + 1 to Arms).map(b => s"${idx(a)} >= ${idx(b)}").mkString(" and ")} then $a")
      .mkString(" ") + s" else $Arms end)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G422: UCB1 bandit over document sources ────────────────────────
    "q477_ucb_bandit" -> ((s, dir) => {
      val arms = (0 until Arms).map(i => s"'src$i'").mkString(", ")
      val docs = Tables.documents(s, dir)
        .filter(expr(s"source in ($arms)"))
        .select(col("source"), col("doc_id"),
          expr("case when lang = 'en' then 1L else 0L end").as("e"),
          expr("md5_60(concat('pull:', cast(doc_id as string)))").as("h"))
        .withColumn("rk", expr(
          "row_number() over (partition by source order by h, doc_id)"))
        .filter(col("rk") <= Pulls)
      val arrs = docs.groupBy("source")
        .agg(expr("transform(array_sort(collect_list(struct(h, doc_id, e))), " +
          "x -> x.e)").as("arr"))
      val one = arrs.agg(
        max(when(col("source") === "src0", col("arr"))).as("a1"),
        (1 until Arms).map(i =>
          max(when(col("source") === s"src$i", col("arr"))).as(s"a${i + 1}")): _*)
        .select(
          expr(s"array(${(1 to Arms).map(i => s"a$i").mkString(", ")})").as("rw"),
          expr(s"transform(array(${(1 to Arms).map(i => s"a$i").mkString(", ")}), " +
            "x -> cast(size(x) as bigint))").as("lens"))
      val nS = (a: Int) => s"element_at(acc.n, $a)"
      val smS = (a: Int) => s"element_at(acc.sm, $a)"
      val sqS = (x: String) => s"cast(floor(sqrt(cast($x as double))) as bigint)"
      val idxS = (a: Int) => ucbIdx(a, nS, smS, "z", "div", sqS)
      val chS = s"cast(case when z <= $Arms then z else ${argmax(idxS)} end as int)"
      val rwv = "element_at(element_at(rw, ch), " +
        "cast(pmod(element_at(acc.n, ch), element_at(lens, ch)) + 1L as int))"
      val fold =
        s"""aggregate(sequence(1, $Pulls),
           |  named_struct('n', transform(sequence(1, $Arms), p -> 0L),
           |    'sm', transform(sequence(1, $Arms), p -> 0L)),
           |  (acc, z) -> element_at(transform(array($chS), ch -> named_struct(
           |    'n', transform(sequence(1, $Arms),
           |      p -> element_at(acc.n, p) + (case when p = ch then 1L else 0L end)),
           |    'sm', transform(sequence(1, $Arms),
           |      p -> element_at(acc.sm, p) +
           |        (case when p = ch then $rwv else 0L end)))), 1))""".stripMargin
      one.withColumn("st", expr(fold))
        .select(explode(expr(s"sequence(1, $Arms)")).as("a"),
          col("rw"), col("lens"), col("st"))
        .select(
          expr("concat('src', cast(a - 1 as string))").as("arm"),
          expr("element_at(lens, a)").as("len_cap"),
          expr("element_at(st.n, a)").as("pulls"),
          expr("element_at(st.sm, a)").as("wins"),
          expr("element_at(st.sm, a) * 10000 div element_at(st.n, a)")
            .as("mean_e4"),
          expr("aggregate(element_at(rw, a), 0L, (x, y) -> x + y) * 10000 " +
            "div element_at(lens, a)").as("true_e4"),
          expr(s"case when aggregate(st.n, 0L, (x, y) -> x + y) = ${Pulls}L " +
            "then 1L else 0L end").as("pulls_total_ok"))
        .orderBy("arm")
    }),

    // ── G423: Hamming(7,4) + SECDED under single/double-bit attack ─────
    "q478_hamming_secded" -> ((s, dir) => {
      var df = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("pmod(md5_60(concat('ham:', cast(o_orderkey as string))), 16)")
            .as("d"),
          expr("1 + pmod(md5_60(concat('flip:', cast(o_orderkey as string))), 7)")
            .as("f"),
          expr("1 + pmod(md5_60(concat('flip2:', cast(o_orderkey as string))), 6)")
            .as("f2r"))
        .withColumn("f2", expr("case when f2r >= f then f2r + 1 else f2r end"))
        .withColumn("d1", expr("(d div 8) % 2"))
        .withColumn("d2", expr("(d div 4) % 2"))
        .withColumn("d3", expr("(d div 2) % 2"))
        .withColumn("d4", expr("d % 2"))
        // codeword positions 1..7 = p1 p2 d1 p3 d2 d3 d4
        .withColumn("c1", expr("(d1 + d2 + d4) % 2"))
        .withColumn("c2", expr("(d1 + d3 + d4) % 2"))
        .withColumn("c3", col("d1")).withColumn("c4", expr("(d2 + d3 + d4) % 2"))
        .withColumn("c5", col("d2")).withColumn("c6", col("d3"))
        .withColumn("c7", col("d4"))
        .withColumn("p8", expr("(c1 + c2 + c3 + c4 + c5 + c6 + c7) % 2"))
      (1 to 7).foreach { i =>
        df = df
          .withColumn(s"r$i",
            expr(s"(c$i + (case when f = $i then 1 else 0 end)) % 2"))
          .withColumn(s"q$i",
            expr(s"(c$i + (case when f = $i then 1 else 0 end) " +
              s"+ (case when f2 = $i then 1 else 0 end)) % 2"))
      }
      df = df
        .withColumn("pos", expr(
          "(r1 + r3 + r5 + r7) % 2 + 2 * ((r2 + r3 + r6 + r7) % 2) " +
            "+ 4 * ((r4 + r5 + r6 + r7) % 2)"))
        .withColumn("pos2", expr(
          "(q1 + q3 + q5 + q7) % 2 + 2 * ((q2 + q3 + q6 + q7) % 2) " +
            "+ 4 * ((q4 + q5 + q6 + q7) % 2)"))
        // f XOR f2 by bit arithmetic — the syndrome-addition theorem
        .withColumn("fx", expr(
          "(f % 2 + f2 % 2) % 2 + 2 * (((f div 2) % 2 + (f2 div 2) % 2) % 2) " +
            "+ 4 * (((f div 4) % 2 + (f2 div 4) % 2) % 2)"))
      val correctedEq = (1 to 7).map(i =>
        s"(r$i + (case when pos = $i then 1 else 0 end)) % 2 = c$i").mkString(" and ")
      val misWrong = (1 to 7).map(i =>
        s"(q$i + (case when pos2 = $i then 1 else 0 end)) % 2 != c$i").mkString(" or ")
      val wBit = (i: Int) => s"((q$i + (case when pos2 = $i then 1 else 0 end)) % 2)"
      val misValid =
        s"(${wBit(1)} + ${wBit(3)} + ${wBit(5)} + ${wBit(7)}) % 2 = 0 and " +
        s"(${wBit(2)} + ${wBit(3)} + ${wBit(6)} + ${wBit(7)}) % 2 = 0 and " +
        s"(${wBit(4)} + ${wBit(5)} + ${wBit(6)} + ${wBit(7)}) % 2 = 0"
      df.agg(
          count(lit(1)).as("n_keys"),
          sum(expr("case when pos = f then 1L else 0L end"))
            .as("n_single_located"),
          sum(expr(s"case when $correctedEq then 1L else 0L end"))
            .as("n_single_corrected"),
          sum(expr("case when pos2 = fx and pos2 != 0 and pos2 != f " +
            "and pos2 != f2 then 1L else 0L end")).as("n_double_syndrome_ok"),
          sum(expr(s"case when ($misWrong) then 1L else 0L end"))
            .as("n_double_miscorrect_wrong"),
          sum(expr(s"case when $misValid then 1L else 0L end"))
            .as("n_double_miscorrect_valid"),
          // SECDED: doubles leave overall parity intact while s != 0
          sum(expr("case when (q1+q2+q3+q4+q5+q6+q7) % 2 = p8 and pos2 != 0 " +
            "then 1L else 0L end")).as("n_secded_detected"),
          // singles flip it — the correct-vs-detect discriminator
          sum(expr("case when (r1+r2+r3+r4+r5+r6+r7) % 2 != p8 and pos != 0 " +
            "then 1L else 0L end")).as("n_secded_single_path"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(pos2 as string))))").as("xor60_syndromes"))
    }),

    // ── G424: external merge-sort pass economics ───────────────────────
    "q479_sort_economics" -> ((s, dir) => {
      // defined byte model: 3×8 key longs + 4-byte int + 4×8 doubles +
      // 8-byte date + the two flag strings
      val n = Tables.lineitem(s, dir)
        .agg(sum(expr("68L + length(l_returnflag) + length(l_linestatus)"))
          .as("n_bytes"))
      val mem = 1048576L // 1 MiB sort budget
      n.select(col("n_bytes"),
          explode(expr("array(1L, 1000L, 1000000L)")).as("scale"))
        .select(col("n_bytes"), col("scale"),
          explode(expr("array(2L, 8L, 64L, 512L)")).as("fanin"))
        .withColumn("total_bytes", expr("n_bytes * scale"))
        .withColumn("runs0", expr(s"(total_bytes + ${mem - 1}L) div ${mem}L"))
        .withColumn("st", expr(
          """aggregate(sequence(1, 50),
            |  named_struct('r', runs0, 'p', 0L),
            |  (st, z) -> case when st.r > 1L
            |    then named_struct('r', (st.r + fanin - 1L) div fanin,
            |      'p', st.p + 1L)
            |    else st end)""".stripMargin))
        .withColumn("passes", expr("st.p"))
        .withColumn("io_bytes", expr("2L * total_bytes * (1L + passes)"))
        .select(col("scale"), col("fanin"), col("total_bytes"), col("runs0"),
          col("passes"), col("io_bytes"),
          expr("io_bytes * 100 div total_bytes").as("io_over_n_e2"),
          expr("case when (fanin >= runs0) = (passes <= 1L) then 1L else 0L end")
            .as("single_merge_ok"))
        .orderBy("scale", "fanin")
    })
  )

  def oracleSql: Map[String, String] = {
    val armsIn = (0 until Arms).map(i => s"'src$i'").mkString(", ")
    val nD = (a: Int) => s"r.n[$a]"
    val smD = (a: Int) => s"r.sm[$a]"
    val sqD = (x: String) => s"CAST(FLOOR(SQRT(CAST(($x) AS DOUBLE))) AS BIGINT)"
    val idxD = (a: Int) => ucbIdx(a, nD, smD, "(r.t + 1)", "//", sqD)
    val aCol = (a: Int) => s"w.a$a"
    val lCol = (a: Int) => s"w.l$a"
    Map(

    "q477_ucb_bandit" ->
      s"""WITH RECURSIVE ranked AS MATERIALIZED (SELECT source, doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS e,
        |    CAST('0x' || substr(md5('pull:' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |      CAST('0x' || substr(md5('pull:' || CAST(doc_id AS VARCHAR)), 1, 15)
        |        AS BIGINT), doc_id) AS rk
        |  FROM documents WHERE source IN ($armsIn)),
        |rwrow AS MATERIALIZED (SELECT
        |  ${(1 to Arms).map(a =>
             s"(SELECT list(e ORDER BY h, doc_id) FROM ranked WHERE source = 'src${a - 1}' AND rk <= $Pulls) AS a$a, " +
             s"(SELECT COUNT(*) FROM ranked WHERE source = 'src${a - 1}' AND rk <= $Pulls) AS l$a").mkString(",\n|  ")}),
        |rec AS (
        |  SELECT 0::BIGINT AS t,
        |    list_transform(range(1, ${Arms + 1}), p -> 0)::BIGINT[] AS n,
        |    list_transform(range(1, ${Arms + 1}), p -> 0)::BIGINT[] AS sm
        |  UNION ALL
        |  SELECT z2.t,
        |    list_transform(range(1, ${Arms + 1}),
        |      p -> z2.n[p] + CASE WHEN p = z2.ch THEN 1 ELSE 0 END)::BIGINT[],
        |    list_transform(range(1, ${Arms + 1}),
        |      p -> z2.sm[p] + CASE WHEN p = z2.ch THEN z2.rwv ELSE 0 END)::BIGINT[]
        |  FROM (
        |    SELECT z1.t, z1.n, z1.sm, z1.ch,
        |      CASE z1.ch ${(1 to Arms).map(a =>
               s"WHEN $a THEN ${aCol(a)}[CAST(z1.n[$a] % ${lCol(a)} + 1 AS INT)]").mkString(" ")}
        |      END AS rwv
        |    FROM (
        |      SELECT r.t + 1 AS t, r.n, r.sm,
        |        CASE WHEN r.t + 1 <= $Arms THEN CAST(r.t + 1 AS INT)
        |             ELSE ${argmax(idxD)} END AS ch
        |      FROM rec r WHERE r.t < $Pulls) z1, rwrow w) z2),
        |fin AS (SELECT n, sm FROM rec WHERE t = $Pulls)
        |SELECT 'src' || CAST(a - 1 AS VARCHAR) AS arm,
        |  CAST(CASE a ${(1 to Arms).map(a => s"WHEN $a THEN ${lCol(a)}").mkString(" ")} END
        |    AS BIGINT) AS len_cap,
        |  CAST(f.n[a] AS BIGINT) AS pulls,
        |  CAST(f.sm[a] AS BIGINT) AS wins,
        |  CAST(f.sm[a] * 10000 // f.n[a] AS BIGINT) AS mean_e4,
        |  CAST(CASE a ${(1 to Arms).map(a =>
             s"WHEN $a THEN list_sum(${aCol(a)}) * 10000 // ${lCol(a)}").mkString(" ")} END
        |    AS BIGINT) AS true_e4,
        |  CAST(CASE WHEN list_sum(f.n) = $Pulls THEN 1 ELSE 0 END AS BIGINT)
        |    AS pulls_total_ok
        |FROM fin f, rwrow w, (SELECT UNNEST(range(1, ${Arms + 1})) AS a)
        |ORDER BY arm""".stripMargin,

    "q478_hamming_secded" -> {
      val base =
        """WITH b AS (SELECT o_orderkey AS k,
          |    CAST('0x' || substr(md5('ham:' || CAST(o_orderkey AS VARCHAR)),
          |      1, 15) AS BIGINT) % 16 AS d,
          |    1 + CAST('0x' || substr(md5('flip:' || CAST(o_orderkey AS VARCHAR)),
          |      1, 15) AS BIGINT) % 7 AS f,
          |    1 + CAST('0x' || substr(md5('flip2:' || CAST(o_orderkey AS VARCHAR)),
          |      1, 15) AS BIGINT) % 6 AS f2r
          |  FROM orders),
          |g AS (SELECT k, d, f,
          |    CASE WHEN f2r >= f THEN f2r + 1 ELSE f2r END AS f2,
          |    (d // 8) % 2 AS d1, (d // 4) % 2 AS d2, (d // 2) % 2 AS d3,
          |    d % 2 AS d4
          |  FROM b),
          |cw AS (SELECT k, f, f2,
          |    (d1 + d2 + d4) % 2 AS c1, (d1 + d3 + d4) % 2 AS c2, d1 AS c3,
          |    (d2 + d3 + d4) % 2 AS c4, d2 AS c5, d3 AS c6, d4 AS c7
          |  FROM g),
          |cp AS (SELECT *, (c1 + c2 + c3 + c4 + c5 + c6 + c7) % 2 AS p8
          |  FROM cw),
          |rx AS (SELECT *,""".stripMargin
      val rq = (1 to 7).map(i =>
        s"    (c$i + (CASE WHEN f = $i THEN 1 ELSE 0 END)) % 2 AS r$i,\n" +
        s"    (c$i + (CASE WHEN f = $i THEN 1 ELSE 0 END) " +
        s"+ (CASE WHEN f2 = $i THEN 1 ELSE 0 END)) % 2 AS q$i").mkString(",\n")
      val syn =
        """
          |  FROM cp),
          |sy AS (SELECT *,
          |    (r1 + r3 + r5 + r7) % 2 + 2 * ((r2 + r3 + r6 + r7) % 2)
          |      + 4 * ((r4 + r5 + r6 + r7) % 2) AS pos,
          |    (q1 + q3 + q5 + q7) % 2 + 2 * ((q2 + q3 + q6 + q7) % 2)
          |      + 4 * ((q4 + q5 + q6 + q7) % 2) AS pos2,
          |    (f % 2 + f2 % 2) % 2
          |      + 2 * (((f // 2) % 2 + (f2 // 2) % 2) % 2)
          |      + 4 * (((f // 4) % 2 + (f2 // 4) % 2) % 2) AS fx
          |  FROM rx)""".stripMargin
      val correctedEq = (1 to 7).map(i =>
        s"(r$i + (CASE WHEN pos = $i THEN 1 ELSE 0 END)) % 2 = c$i")
        .mkString(" AND ")
      val misWrong = (1 to 7).map(i =>
        s"(q$i + (CASE WHEN pos2 = $i THEN 1 ELSE 0 END)) % 2 != c$i")
        .mkString(" OR ")
      val wBit = (i: Int) =>
        s"((q$i + (CASE WHEN pos2 = $i THEN 1 ELSE 0 END)) % 2)"
      val misValid =
        s"(${wBit(1)} + ${wBit(3)} + ${wBit(5)} + ${wBit(7)}) % 2 = 0 AND " +
        s"(${wBit(2)} + ${wBit(3)} + ${wBit(6)} + ${wBit(7)}) % 2 = 0 AND " +
        s"(${wBit(4)} + ${wBit(5)} + ${wBit(6)} + ${wBit(7)}) % 2 = 0"
      base + "\n" + rq + syn +
        s"""
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
          |  CAST(SUM(CASE WHEN pos = f THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_single_located,
          |  CAST(SUM(CASE WHEN $correctedEq THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_single_corrected,
          |  CAST(SUM(CASE WHEN pos2 = fx AND pos2 != 0 AND pos2 != f
          |    AND pos2 != f2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_double_syndrome_ok,
          |  CAST(SUM(CASE WHEN ($misWrong) THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_double_miscorrect_wrong,
          |  CAST(SUM(CASE WHEN $misValid THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_double_miscorrect_valid,
          |  CAST(SUM(CASE WHEN (q1+q2+q3+q4+q5+q6+q7) % 2 = p8 AND pos2 != 0
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_secded_detected,
          |  CAST(SUM(CASE WHEN (r1+r2+r3+r4+r5+r6+r7) % 2 != p8 AND pos != 0
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_secded_single_path,
          |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
          |    CAST(pos2 AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_syndromes
          |FROM sy""".stripMargin
    },

    "q479_sort_economics" ->
      s"""WITH RECURSIVE nb AS (SELECT
        |    SUM(68 + length(l_returnflag) + length(l_linestatus)) AS n_bytes
        |  FROM lineitem),
        |grid AS (SELECT nb.n_bytes, s.scale, f.fanin,
        |    nb.n_bytes * s.scale AS total_bytes,
        |    (nb.n_bytes * s.scale + 1048575) // 1048576 AS runs0
        |  FROM nb,
        |    (SELECT UNNEST([1, 1000, 1000000]) AS scale) s,
        |    (SELECT UNNEST([2, 8, 64, 512]) AS fanin) f),
        |rec AS (
        |  SELECT scale, fanin, total_bytes, runs0, runs0 AS r, 0::BIGINT AS p
        |  FROM grid
        |  UNION ALL
        |  SELECT scale, fanin, total_bytes, runs0,
        |    (r + fanin - 1) // fanin, p + 1
        |  FROM rec WHERE r > 1),
        |fin AS (SELECT scale, fanin, total_bytes, runs0,
        |    MAX(p) AS passes FROM rec GROUP BY 1, 2, 3, 4)
        |SELECT CAST(scale AS BIGINT) AS scale, CAST(fanin AS BIGINT) AS fanin,
        |  CAST(total_bytes AS BIGINT) AS total_bytes,
        |  CAST(runs0 AS BIGINT) AS runs0,
        |  CAST(passes AS BIGINT) AS passes,
        |  CAST(2 * total_bytes * (1 + passes) AS BIGINT) AS io_bytes,
        |  CAST(2 * total_bytes * (1 + passes) * 100 // total_bytes AS BIGINT)
        |    AS io_over_n_e2,
        |  CAST(CASE WHEN (fanin >= runs0) = (passes <= 1) THEN 1 ELSE 0 END
        |    AS BIGINT) AS single_merge_ok
        |FROM fin ORDER BY scale, fanin""".stripMargin
    )
  }
}
