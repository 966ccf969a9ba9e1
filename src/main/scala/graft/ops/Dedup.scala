package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared kernels of the near-dup dedup family (SURVEY §2.11 G-ops).
  *
  * Round 5 grew three byte-identical copies of the banded-LSH candidate
  * block (q23 minhash pairs, q88 incremental dedup, q93 containment) and
  * three of the narrow token-row Jaccard verify join — VERDICT r5 "next"
  * #6 flagged the drift risk for the next consumer. The blocks live here
  * once; the call sites keep their query-specific thresholds and output
  * shapes. Pure refactor: every consumer's result hash is unchanged.
  *
  * Scale contract (unchanged from the inlined forms): candidates come
  * from an EQUI-join on (group, band_id, bucket) — never an all-pairs
  * comparison — and the verify join shuffles narrow (doc, tok) rows,
  * never token arrays (the r4 array-shuffle defect class).
  */
object Dedup {

  /** Explode per-row band signature columns to (carry..., id, band_id,
    * bucket) rows — the LSH index table both candidate forms join on.
    * `carryCols` rides extra columns through (q88 carries `source` to
    * split probe/corpus sides AFTER the explode, so the explode itself
    * is shared work). */
  def bandTable(sigs: DataFrame, idCol: String, bandCols: Seq[String],
                carryCols: Seq[String] = Nil): DataFrame =
    sigs.select((carryCols :+ idCol).map(col) :+
      posexplode(array(bandCols.map(col): _*)).as(Seq("band_id", "bucket")): _*)

  /** Symmetric banded candidate pairs: self-join the band table on
    * (groupCols, band_id, bucket) with `idCol < idCol` to orient each
    * pair once, distinct to fold multi-band agreement. The join is an
    * equi-join on hashed bucket keys — shuffle-partitioned, AQE/skew
    * governed, O(pairs-that-share-a-bucket), never O(n²). */
  def selfBandCandidates(sigs: DataFrame, idCol: String, bandCols: Seq[String],
                         groupCols: Seq[String] = Nil,
                         aName: String = "doc_a", bName: String = "doc_b"): DataFrame = {
    val bands = bandTable(sigs, idCol, bandCols, groupCols)
    val keys = groupCols ++ Seq("band_id", "bucket")
    val cond = keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col(s"x.$idCol") < col(s"y.$idCol")
    bands.as("x").join(bands.as("y"), cond)
      .select(col(s"x.$idCol").as(aName), col(s"y.$idCol").as(bName))
      .distinct()
  }

  /** Exact token-set overlap for a candidate pair table, WITHOUT carrying
    * token arrays through the shuffle: explode-once (doc, tok) rows join
    * the pair table per side, matching rows count the intersection, and
    * per-doc token counts join in for the union/containment terms.
    * Returns (aCol, bCol, inter, na, nb); callers derive Jaccard or
    * containment and apply their thresholds. A pair with ZERO common
    * tokens drops at the inner join — every caller's threshold discards
    * it anyway, and not emitting it keeps the verify join inner (no
    * null-fill pass). `tokRows` must be (doc_id, tok) with one row per
    * DISTINCT token per doc. */
  def tokenOverlap(cand: DataFrame, tokRows: DataFrame,
                   aCol: String, bCol: String): DataFrame = {
    val sizes = tokRows.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cand
      .join(tokRows.select(col("doc_id").as(aCol), col("tok")), Seq(aCol))
      .join(tokRows.select(col("doc_id").as(bCol), col("tok")), Seq(bCol, "tok"))
      .groupBy(aCol, bCol).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as(aCol), col("n").as("na")), Seq(aCol))
      .join(sizes.select(col("doc_id").as(bCol), col("n").as("nb")), Seq(bCol))
  }
}
