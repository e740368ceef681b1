package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — a single narrow scan + per-row
  * arithmetic + a k-row TakeOrdered; at 100 TB this is the map-side-only
  * plan (no shuffle except the final top-k collect).
  *
  * Scale path: sign-random-projection LSH — hyperplanes derived from a
  * deterministic hash (no RNG state to ship), bucket id = packed sign
  * bits; candidates restricted to the query's bucket (optionally
  * multi-probe neighbors). Bucketing is one narrow column; search becomes
  * a partition-pruned scan when the table is written bucketed by it.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns, computed with
    * left-to-right folds (matches the oracle's evaluation order).
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.DotProduct.dotProduct
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))
  }

  def toDouble(emb: Column): Column = transform(emb, _.cast("double"))

  /** Euclidean norm of an array<double> column (native dot product). */
  def norm(a: Column): Column =
    sqrt(graft.functions.DotProduct.dotProduct(a, a))

  /** Brute-force cosine top-k against one query vector (cross-joined as a
    * single broadcast row — no shuffle of the big side). Norms are
    * precomputed once per side — same IEEE values, a third of the fold
    * work per pair.
    */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     query: DataFrame, queryEmbCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(toDouble(col(queryEmbCol)).as("__q"))
      .withColumn("__qn", norm(col("__q"))))
    df.select(col(idCol), toDouble(col(embCol)).as("__e"))
      .withColumn("__en", norm(col("__e")))
      .crossJoin(q)
      .select(col(idCol),
        round(graft.functions.DotProduct.dotProduct(col("__e"), col("__q"))
          / (col("__en") * col("__qn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic hyperplane matrix (planes x dim), derived from a fixed
    * seed driver-side — no RNG state ships to executors; every plan
    * derives identical planes.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id: `planes` sign bits packed into a
    * long, via native dot products against a single literal plane matrix
    * (one Catalyst Literal -> codegen references, not inlined source).
    */
  def lshBucket(emb: Column, planes: Int, dim: Int = 64): Column = {
    val mat = {
      import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      org.apache.spark.sql.graft.bridge.toColumn(
        CatLit.create(hyperplanes(planes, dim).toArray,
          ArrayType(ArrayType(DoubleType, false), false)))
    }
    val signBits = transform(mat, p =>
      when(graft.functions.DotProduct.dotProduct(emb, p) >= 0, 1.0).otherwise(0.0))
    // pack bits: sum(bit_p * 2^p); exact in doubles for planes <= 52
    aggregate(zip_with(signBits,
        sequence(lit(0), lit(planes - 1)),
        (bit, i) => bit * pow(lit(2.0), i.cast("double"))),
      lit(0.0), _ + _).cast("long")
  }

  /** LSH-bucketed ANN top-k: compute the query's bucket, scan only rows
    * whose bucket matches in >= (planes - probeSlack) sign bits
    * (multi-probe via hamming tolerance), then exact cosine on the
    * candidates.
    */
  def lshTopK(df: DataFrame, embCol: String, idCol: String,
              query: DataFrame, queryEmbCol: String, k: Int,
              planes: Int = 16, probeSlack: Int = 3): DataFrame = {
    val data = df.select(col(idCol), toDouble(col(embCol)).as("__e"))
      .withColumn("__bucket", lshBucket(col("__e"), planes))
    val q = broadcast(query.select(toDouble(col(queryEmbCol)).as("__q"))
      .withColumn("__qbucket", lshBucket(col("__q"), planes)))
    data.crossJoin(q)
      .filter(bit_count(col("__bucket").bitwiseXOR(col("__qbucket"))) <= probeSlack)
      .select(col(idCol), round(cosine(col("__e"), col("__q")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: exact cosine inside coarse buckets
    * (provided column, e.g. a cluster/label id) — the verify stage that
    * LSH candidates feed at scale.
    */
  def cosinePairs(df: DataFrame, embCol: String, idCol: String,
                  bucketCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(bucketCol).as("__bk"), col(idCol).cast("long").as("id"),
        toDouble(col(embCol)).as("__e"))
      .withColumn("__n", norm(col("__e")))
    val a = base.select(col("__bk"), col("id").as("id_a"), col("__e").as("__ea"), col("__n").as("__na"))
    val b = base.select(col("__bk"), col("id").as("id_b"), col("__e").as("__eb"), col("__n").as("__nb"))
    a.join(b, Seq("__bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.DotProduct.dotProduct(col("__ea"), col("__eb"))
          / (col("__na") * col("__nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
