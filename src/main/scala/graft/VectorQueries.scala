package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exactness baseline, group-restricted
  * near-dup pairing, and a sign-random-projection LSH-bucketed variant as
  * the 100-TB scale path (bucket equi-join instead of a cross join).
  *
  * Cosines are rounded to 6 decimals before ranking so both engines rank
  * identical values (per-element IEEE ops match; only final-ulp
  * accumulation noise differs).
  */
object VectorQueries {

  private val LshPlanes = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-k for one query vector (vec_id 0): the
    // correctness baseline every ANN variant is judged against. The query
    // vector is broadcast; the scan stays embarrassingly parallel.
    "q26_ann_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qe"))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("ve"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosineR6(col("ve"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(5)
    }),

    // Near-duplicate candidate pairs restricted to same-label groups
    // (group equi-join, not O(n²)); top-10 most similar.
    "q27_embedding_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          cosineR6(col("a.v"), col("b.v")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_a"), col("vec_b"))
        .limit(10)
    }),

    // LSH-bucketed ANN (scale path): deterministic sign-random-projection
    // buckets; search only the query's bucket. Rows-only check (bucket
    // recall is engine-defined; brute-force q26 is the oracle-matched
    // baseline).
    "q28_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), LshPlanes))
      val q = e.filter(col("vec_id") === 0)
        .select(col("v").as("qe"), col("bucket").as("qbucket"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"), cosineR6(col("v"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(5)
    })
  )

  def oracleSql: Map[String, String] = {
    val cosR6 = sqlCosineR6("ve", "qe")
    val cosAb = sqlCosineR6("va", "vb")
    Map(
      "q26_ann_bruteforce" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
           |     e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings WHERE vec_id != 0)
           |SELECT vec_id, $cosR6 AS cos_r
           |FROM e, q ORDER BY cos_r DESC, vec_id LIMIT 5""".stripMargin,

      "q27_embedding_neardup" ->
        s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |       ${sqlCosineR6("a.v", "b.v")} AS cos_r
           |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
           |ORDER BY cos_r DESC, vec_a, vec_b LIMIT 10""".stripMargin
      // q28_ann_lsh: rows-only (engine-defined bucketing)
    )
  }
}
