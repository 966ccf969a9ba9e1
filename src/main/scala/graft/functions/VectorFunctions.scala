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
    * IEEE ops are identical; only final-ulp noise differs). */
  def cosineR6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  // --- SQL mirrors (DuckDB dialect), same accumulation order -------------

  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]))"

  def sqlCosineR6(a: String, b: String): String =
    s"round(${sqlDot(a, b)} / sqrt(${sqlDot(a, a)}) / sqrt(${sqlDot(b, b)}), 6)"

  /** Deterministic LSH hyperplane sign for plane `p`, dimension `i`:
    * ±1 from one md5 hex digit — reproducible in any engine, no RNG. */
  def planeSign(p: Int, i: Column): Column = {
    val digit = substring(md5(concat(lit(s"plane$p:"), i.cast("string"))), 1, 1)
    when(conv(digit, 16, 10).cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Sign-random-projection LSH bucket id over `nPlanes` deterministic
    * hyperplanes: bit p = [dot(v, plane_p) > 0]. */
  def lshBucket(v: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
