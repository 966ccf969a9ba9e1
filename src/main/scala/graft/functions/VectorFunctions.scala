package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (`Array[Float]` columns) for similarity
  * search and near-duplicate detection.
  *
  * Dot products and norms are built from zip_with/aggregate higher-order
  * functions over the array — codegen'd, no UDF, no shuffle. Arithmetic is
  * forced to double with a fixed left-to-right accumulation order so the
  * same formula evaluated by another engine (the DuckDB oracle) produces
  * bit-identical results before rounding.
  */
object VectorFunctions {

  /** Cast float vector to double before any arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, computed as dot / sqrt(na) / sqrt(nb) — the exact
    * op sequence mirrored in SQL oracles; round before comparing or
    * ranking across engines. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a)) / sqrt(norm2(b))

  /** Cosine rounded to 6 decimals: rank-stable across engines (per-element
    * IEEE ops are identical; only final-ulp noise differs). Evaluated by
    * the fused native kernel (graft.plans.CosineR6) — bit-identical to
    * the declarative round(dot/sqrt/sqrt) form (same left-to-right
    * accumulation, same HALF_UP rounding; asserted in
    * MinHashKernelSpec) without interpreted per-element lambdas. */
  def cosineR6(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.CosineR6(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The declarative HOF form of [[cosineR6]] (kernel equivalence
    * reference). */
  def cosineR6Hof(a: Column, b: Column): Column = round(cosine(a, b), 6)

  // --- SQL mirrors (DuckDB dialect), same accumulation order -------------

  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]))"

  def sqlCosineR6(a: String, b: String): String =
    s"round(${sqlDot(a, b)} / sqrt(${sqlDot(a, a)}) / sqrt(${sqlDot(b, b)}), 6)"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplane signs for plane `p`, computed ONCE at
    * plan-build time (md5 parity of "plane{p}:{i}") — the per-row md5
    * storm of round 1 (nPlanes × dims md5 calls per vector) becomes a
    * plain dot product against an array literal. */
  def planeSigns(p: Int, dims: Int): Seq[Int] =
    (0 until dims).map { i =>
      if (Integer.parseInt(md5Hex(s"plane$p:$i").substring(0, 1), 16) % 2 == 0) 1 else -1
    }

  /** Sign-random-projection LSH bucket over the given plane range:
    * bit k = [proj(v, plane_(range(k))) > 0]. The projection is computed in
    * scaled-BIGINT arithmetic (round(x·1e6)·sign summed as longs) so it is
    * exact and summation-order-independent — bit-identical in any engine,
    * no float accumulation-order risk on the sign test. Evaluated by the
    * fused native kernel (graft.plans.SrpKernel): one codegen'd pass over
    * the vector for ALL planes, vs one interpreted zip_with/aggregate
    * lambda pair PER plane in the declarative form ([[lshBucketHof]] —
    * equivalence asserted in MinHashKernelSpec). Plane ranges must be
    * contiguous (all uses are). */
  def lshBucket(v: Column, planes: Range, dims: Int): Column = {
    require(planes.step == 1, s"srp_bucket needs a contiguous plane range, got $planes")
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.SrpBucket(
      GraftColumnBridge.expression(v), planes.start, planes.length, dims))
  }

  /** The declarative HOF form of [[lshBucket]] (kernel equivalence
    * reference; interpreted lambdas — never on a hot path). */
  def lshBucketHof(v: Column, planes: Range, dims: Int): Column = {
    val bits = planes.zipWithIndex.map { case (p, k) =>
      val signs = typedLit(planeSigns(p, dims))
      val proj = aggregate(
        zip_with(v, signs, (x, s) => round(x * 1000000).cast("long") * s),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, lit(1 << k)).otherwise(lit(0))
    }
    bits.map(_.cast("long")).reduce(_ + _)
  }

  /** DuckDB mirror of [[lshBucket]]: same sign literals, same scaled-int
    * projection. */
  def sqlLshBucket(v: String, planes: Range, dims: Int): String =
    planes.zipWithIndex.map { case (p, k) =>
      val signs = planeSigns(p, dims).mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,${dims + 1}), i -> CAST(round(list_extract($v,i)*1000000) AS BIGINT) * list_extract($signs,i))) > 0 THEN ${1 << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
