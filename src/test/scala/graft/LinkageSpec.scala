package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the linkage/allocation wave (q437-q440):
  * Soundex classic vectors + builtin equivalence, capture-recapture
  * closure certificate, CEM support accounting, apportionment seat
  * conservation and quota-rounding bounds.
  */
class LinkageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q437 soundex: classic vectors, builtin parity, probe blocks present") {
    // the National-Archives test vectors, including H-transparency
    // (Ashcraft) and first-letter collapse (Pfister)
    val vectors = Seq(
      "robert" -> "R163", "rupert" -> "R163", "ashcraft" -> "A261",
      "ashcroft" -> "A261", "tymczak" -> "T522", "pfister" -> "P236",
      "honeyman" -> "H555", "jackson" -> "J250", "smith" -> "S530",
      "smythe" -> "S530", "lloyd" -> "L300")
    val df = spark.createDataFrame(vectors.map(v => Tuple1(v._1)))
      .toDF("tok")
      .selectExpr("tok", s"${LinkageQueries.soundexExpr("tok", duck = false)} as code")
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (t, want) =>
      assert(got(t) == want, s"soundex($t) = ${got(t)}, want $want") }

    // our expression chain must agree with Spark's built-in soundex
    // over the entire corpus vocabulary + probes
    import graft.functions.TextFunctions.tokens
    val vocab = Tables.documents(spark, sf)
      .select(explode(tokens(lower(col("text")))).as("tok"))
      .unionByName(spark.createDataFrame(
        LinkageQueries.ProbeNames.map(Tuple1(_))).toDF("tok"))
      .filter(col("tok").rlike("^[a-z]+$")).distinct()
    val disagree = vocab
      .selectExpr("tok",
        s"${LinkageQueries.soundexExpr("tok", duck = false)} as ours",
        "soundex(upper(tok)) as builtin")
      .filter(col("ours") =!= col("builtin")).collect()
    assert(disagree.isEmpty,
      s"chain != builtin on: ${disagree.map(_.getString(0)).mkString(",")}")

    val rows = run("q437_soundex_blocking").collect()
    val codes = rows.map(_.getString(0)).toSet
    Seq("R163", "A261", "S530", "J250").foreach(c =>
      assert(codes.contains(c), s"probe block $c missing"))
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(2) == r.getLong(1) * (r.getLong(1) - 1) / 2)
    }
  }

  test("q438 capture-recapture: closure certified, estimators ordered") {
    val Array(r) = run("q438_capture_recapture").collect()
    val (n1, n2, m, truth) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getLong(4) == 1L, "A union B is the whole corpus")
    assert(m <= math.min(n1, n2) && m > 0)
    val (lp, chap) = (r.getLong(5), r.getLong(6))
    assert(chap <= lp, "Chapman never exceeds Lincoln-Petersen")
    assert(lp >= math.max(n1, n2), "estimate at least the larger capture")
    assert(truth <= n1 + n2, "union bound")
  }

  test("q439 CEM: support accounting closes, ATT shrinks toward null") {
    val Array(r) = run("q439_cem_att").collect()
    val (nt, ntm, ntd) = (r.getLong(0), r.getLong(4), r.getLong(5))
    assert(ntm + ntd == nt, "matched + dropped = treated")
    assert(r.getLong(3) <= r.getLong(2), "matched strata subset")
    // randomized segment assignment: CEM must not AMPLIFY the naive
    // difference by more than the stratification noise allows
    val (naive, att) = (r.getLong(6), r.getLong(7))
    assert(math.abs(att) <= 3 * math.abs(naive) + 100,
      s"att $att vs naive $naive")
  }

  test("q440 apportionment: seats conserve, quota rounding bounds hold") {
    val rows = run("q440_apportionment").collect()
    assert(rows.map(_.getLong(3)).sum == 100L, "Hamilton 100 seats exactly")
    assert(rows.map(_.getLong(4)).sum == 101L, "Hamilton 101 seats exactly")
    assert(rows.map(_.getLong(6)).sum == 100L, "D'Hondt 100 seats exactly")
    rows.foreach { r =>
      val (q4, h100) = (r.getLong(2), r.getLong(3))
      // Hamilton stays within one seat of the exact quota
      assert(math.abs(h100 * 10000 - q4) <= 10000L,
        s"quota rule violated: $h100 vs ${q4 / 10000.0}")
      // house monotonicity violations are flagged only when real
      assert(r.getLong(5) == (if (r.getLong(4) < h100) 1L else 0L))
    }
  }
}
