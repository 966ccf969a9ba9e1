package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Exact fixed-point natural log — the shared kernel born in q534's PSI
  * and reused wherever a pipeline needs ln of a ratio without floats
  * (q539 DSIR importance weights). ln(hi/lo) at e9 for BIGINT inputs
  * hi ≥ lo ≥ 1, hi/lo < 2^22:
  *
  *   r  = hi·1e9 div lo                      (e9 ratio, ≥ 1e9)
  *   k  = floor(log2(r/1e9))                 (pinned CASE ladder)
  *   r2 = r div 2^k                          (range-reduced to [1, 2))
  *   z  = (r2−1e9)·1e9 div (r2+1e9)          (atanh argument, ≤ 1/3)
  *   ln = k·ln2_e9 + 2·(z + z³/3 + z⁵/5 + z⁷/7 + z⁹/9 + z¹¹/11 + z¹³/13)
  *
  * z ≤ 1/3 so successive odd terms decay ≥ 9×; the truncated tail plus
  * per-div floor loss keeps |error| < ~2e-7 — and both engines run the
  * IDENTICAL integer steps, so results are bit-equal regardless.
  * Every power is staged as its own column/CTE (never textual nesting —
  * the exponential-subexpression trap q452 hit). Certified against
  * math.log in MonitorOpsSpec.
  */
object FixedLn {

  /** ln(2) at e9 — design literal shared by both engines. */
  val Ln2E9 = 693147181L

  /** k = floor(log2(R/1e9)) for R ∈ [1e9, 2^22·1e9) as a pinned CASE.
    * Ladder top is 21 (ADVICE r11): q541's magnitude guard can emit
    * hi/lo up to ~4e6 when the lo leg clamps to 1, and a saturated
    * ladder would push the atanh argument past 1/3 and void the error
    * bound. k=21 keeps r2 ∈ [1, 2) across the whole widened domain. */
  def log2Case(r: String): String =
    "(case " + (21 to 1 by -1).map(k =>
      s"when $r >= ${(1L << k) * 1000000000L}L then $k").mkString(" ") +
      " else 0 end)"
  def log2CaseSql(r: String): String =
    "(CASE " + (21 to 1 by -1).map(k =>
      s"WHEN $r >= ${(1L << k) * 1000000000L} THEN $k").mkString(" ") +
      " ELSE 0 END)"

  /** Append column `out` = ln(hiCol/loCol)·1e9 (hiCol ≥ loCol ≥ 1).
    * Intermediates are staged columns prefixed `_ln_` and dropped. */
  def lnE9(df: DataFrame, hiCol: String, loCol: String, out: String): DataFrame = {
    val stages = Seq(
      "r" -> s"$hiCol * 1000000000 div $loCol",
      "k" -> log2Case("_ln_r"),
      "r2" -> "_ln_r div shiftleft(1L, _ln_k)",
      "z" -> "(_ln_r2 - 1000000000) * 1000000000 div (_ln_r2 + 1000000000)",
      "z2" -> "_ln_z * _ln_z div 1000000000",
      "z3" -> "_ln_z * _ln_z2 div 1000000000",
      "z5" -> "_ln_z3 * _ln_z2 div 1000000000",
      "z7" -> "_ln_z5 * _ln_z2 div 1000000000",
      "z9" -> "_ln_z7 * _ln_z2 div 1000000000",
      "z11" -> "_ln_z9 * _ln_z2 div 1000000000",
      "z13" -> "_ln_z11 * _ln_z2 div 1000000000")
    val staged = stages.foldLeft(df) { case (d, (n, e)) =>
      d.withColumn(s"_ln_$n", expr(e)) }
    staged
      .withColumn(out, expr(s"_ln_k * ${Ln2E9}L + 2 * (_ln_z " +
        "+ _ln_z3 div 3 + _ln_z5 div 5 + _ln_z7 div 7 + _ln_z9 div 9 " +
        "+ _ln_z11 div 11 + _ln_z13 div 13)"))
      .drop(stages.map(s => s"_ln_${s._1}"): _*)
  }

  /** DuckDB mirror: chained CTEs from `src` (which must expose `hi` and
    * `lo`; all other columns ride through `*`), ending in a CTE named
    * `{pre}12` that adds `{out}`. Caller splices the returned text after
    * its own CTE list and selects from `{pre}12`. */
  def sqlLnE9Stages(src: String, hi: String, lo: String, out: String,
                    pre: String): String = {
    val steps = Seq(
      s"$hi * 1000000000 // $lo AS _r",
      s"${log2CaseSql("_r")} AS _k",
      "_r // (1::BIGINT << _k) AS _r2",
      "(_r2 - 1000000000) * 1000000000 // (_r2 + 1000000000) AS _z",
      "_z * _z // 1000000000 AS _z2",
      "_z * _z2 // 1000000000 AS _z3",
      "_z3 * _z2 // 1000000000 AS _z5",
      "_z5 * _z2 // 1000000000 AS _z7",
      "_z7 * _z2 // 1000000000 AS _z9",
      "_z9 * _z2 // 1000000000 AS _z11",
      "_z11 * _z2 // 1000000000 AS _z13")
    val ctes = steps.zipWithIndex.map { case (s, i) =>
      val from = if (i == 0) src else s"$pre$i"
      s"${pre}${i + 1} AS (SELECT *, $s FROM $from)"
    }
    // Ln2E9 forced to BIGINT: k reaches 21 at the kernel's range limit
    // and 21 · 693147181 overflows the INT32 the bare literal infers
    val fin = s"${pre}12 AS (SELECT *, _k * CAST($Ln2E9 AS BIGINT) + 2 * (_z " +
      "+ _z3 // 3 + _z5 // 5 + _z7 // 7 + _z9 // 9 + _z11 // 11 " +
      s"+ _z13 // 13) AS $out FROM $pre${steps.length})"
    (ctes :+ fin).mkString(",\n")
  }
}
