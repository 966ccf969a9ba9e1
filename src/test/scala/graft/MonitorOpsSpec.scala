package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the model-monitoring-ops wave (q534–q536). */
class MonitorOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Pure-Scala replica of the shared fixed-point ln kernel (q534):
    * ln(hi/lo) at e9 via 2^k range reduction + 7-term atanh series,
    * Long arithmetic identical to both engines' SQL.
    */
  private def lnE9(hi: Long, lo: Long): Long = {
    val r = hi * 1000000000L / lo
    val k = (19 to 1 by -1).find(kk => r >= (1L << kk) * 1000000000L).getOrElse(0)
    val r2 = r / (1L << k)
    val z = (r2 - 1000000000L) * 1000000000L / (r2 + 1000000000L)
    val z2 = z * z / 1000000000L
    val z3 = z * z2 / 1000000000L
    val z5 = z3 * z2 / 1000000000L
    val z7 = z5 * z2 / 1000000000L
    val z9 = z7 * z2 / 1000000000L
    val z11 = z9 * z2 / 1000000000L
    val z13 = z11 * z2 / 1000000000L
    k * 693147181L + 2 * (z + z3 / 3 + z5 / 5 + z7 / 7 + z9 / 9 + z11 / 11 + z13 / 13)
  }

  test("ln kernel: exact-integer atanh series tracks math.log to < 1e-6") {
    // the kernel's domain in q534: p, q are e6 shares clipped to [1, 1e6]
    val probes = Seq(
      (1L, 1L), (2L, 1L), (3L, 2L), (10L, 7L), (1000000L, 1L),
      (1000000L, 999999L), (123457L, 901L), (500000L, 3L), (7L, 7L),
      (999983L, 17L), (1048576L, 1L), (31L, 30L))
    probes.foreach { case (hi, lo) =>
      val got = lnE9(hi, lo)
      val want = math.log(hi.toDouble / lo.toDouble) * 1e9
      assert(math.abs(got - want) < 1000.0,
        s"ln($hi/$lo): kernel $got vs double $want")
      assert(got >= 0, "hi >= lo so ln >= 0")
    }
    // monotone in the ratio — what the PSI term ordering relies on
    val seq = Seq(1L, 2L, 3L, 10L, 100L, 10000L, 1000000L).map(lnE9(_, 1L))
    assert(seq == seq.sorted && seq.distinct == seq, "strictly monotone")
  }

  test("q534 PSI: non-negative, bands consistent, both windows populated") {
    val rows = run("q534_psi_drift").collect()
    assert(rows.length > 1, "one row per nation present in both halves")
    rows.foreach { r =>
      val (nb, nc, psi, band) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(nb > 0 && nc > 0, "both calendar halves non-empty")
      assert(psi >= 0, "PSI = sum |p-q| * ln(hi/lo) is a sum of >= 0 terms")
      val wantBand =
        if (psi < 100000000L) "stable"
        else if (psi < 200000000L) "moderate" else "shifted"
      assert(band == wantBand, s"band mapping at psi_e9=$psi")
    }
  }

  test("q535 tracking signal: TS bounded in [-1, 1], flags consistent") {
    val rows = run("q535_tracking_signal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, nFlag, firstFlag, tsFinal, bias) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      assert(nDays >= 1 && nDays <= 28, "holdout is at most 28 days")
      assert(nFlag <= nDays, "flags are a subset of days")
      assert((nFlag == 0) == (firstFlag == -1L),
        "first flag day present iff any day flagged")
      assert(math.abs(tsFinal) <= 1000000L,
        "|sum e| <= sum |e| so |TS| <= 1 at e6")
      val wantBias =
        if (tsFinal > 0) "over" else if (tsFinal < 0) "under" else "none"
      assert(bias == wantBias)
    }
  }

  private def sdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

  test("q536 Theta: full pipeline replayed bit-equal in BigInt") {
    import spark.implicits._
    // day-grain input, re-derived exactly as the query's first stage
    val nd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("g"),
        org.apache.spark.sql.functions.expr(
          "datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(round(o_totalprice * 100) as bigint))").as("y"))
      .as[(Long, Long, Long)].collect()
    val cut = nd.map(_._2).max - 28
    val d0 = nd.map(_._2).min
    val byG = nd.groupBy(_._1)
    val replay = byG.flatMap { case (g, rows) =>
      val train = rows.filter(_._2 <= cut).sortBy(_._2)
      val hold = rows.filter(_._2 > cut).sortBy(_._2)
      if (train.isEmpty || hold.isEmpty) None else {
        val xs = train.map(r => BigInt(r._2 - d0))
        val ys = train.map(r => BigInt(r._3))
        val n = BigInt(train.length)
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum
        val bnum = n * sxy - sx * sy
        val bden = (n * sxx - sx * sx).max(BigInt(1))
        val b = sdiv(bnum * 1000000, bden)
        val a = sdiv(sy * 1000000 - b * sx, n)
        val ths = xs.zip(ys).map { case (x, y) =>
          2 * y - sdiv(a + b * x, 1000000) }
        val l = ths.tail.foldLeft(ths.head)((acc, v) =>
          acc + sdiv(3 * (v - acc), 10))
        val fDow = train.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> BigInt(rs.map(_._3).sum) / rs.length }
        val fAll = ys.sum / n
        val (sTheta, sDow) = hold.foldLeft((BigInt(0), BigInt(0))) {
          case ((st, sd), (_, dn, y)) =>
            val x = BigInt(dn - d0)
            val trend = sdiv(a + b * x, 1000000)
            val fTheta = sdiv(l + trend, 2).max(BigInt(0))
            val fd = fDow.getOrElse(((dn % 7) + 7) % 7, fAll)
            (st + (BigInt(y) - fTheta).abs, sd + (BigInt(y) - fd).abs)
        }
        Some(g -> (hold.length.toLong, (sTheta / hold.length).toLong,
          (sDow / hold.length).toLong, b.toLong))
      }
    }
    val got = run("q536_theta_method").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    assert(got.keySet == replay.keySet, "same nation set")
    replay.foreach { case (g, (nT, maeT, maeD, slope)) =>
      val (gn, gt, gd, gs, win) = got(g)
      assert(gn == nT && gt == maeT && gd == maeD && gs == slope,
        s"nation $g: replay ($nT,$maeT,$maeD,$slope) vs query ($gn,$gt,$gd,$gs)")
      assert(win == (if (maeT <= maeD) "theta" else "dow_mean"))
    }
  }
}
