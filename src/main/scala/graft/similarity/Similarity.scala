package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Widen an embedding column to `array<double>`. A plain Cast, NOT
    * `transform(emb, _.cast("double"))`: Cast over an array is
    * whole-stage-codegen'd and a no-op on an already-double column,
    * while the transform form is a CodegenFallback higher-order loop
    * that boxes every element on every row even when the input is
    * already double (VERDICT r15 #3 — the residual interpreted wrapper
    * in the IVF assign path). Same values, same null semantics
    * (element-wise float→double widening is exact).
    */
  def toDouble(emb: Column): Column = emb.cast("array<double>")

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

  /** Bucket-local k-NN graph: for EVERY vector, its top-k cosine
    * neighbors within the same coarse bucket — the batch shape semdedup /
    * agglomerative-clustering pipelines consume (bruteForceTopK serves
    * ONE query; a per-doc loop over it would be a driver-side join).
    *
    * Same scale skeleton as [[cosinePairs]]: one (bucket)-clustered
    * self-join, oversized buckets split into capped rank-chunk
    * sub-buckets with a half-offset stitching pass (see
    * [[graft.operators.SubBuckets]] — bounded extra work instead of
    * dropped recall), then a per-vector top-k window (partitioned by
    * vector id — parallelism = corpus size). Ties broken by neighbor id
    * for determinism.
    */
  def knnGraph(df: DataFrame, embCol: String, idCol: String,
               bucketCol: String, k: Int, maxBucket: Int = 1000): DataFrame = {
    import graft.operators.SubBuckets
    requireIntegralId(df, idCol)
    val base = SubBuckets.withMembership(
        df.select(col(bucketCol).as("__bk"), col(idCol).cast("long").as("id"),
          toDouble(col(embCol)).as("__e")),
        Seq(col("__bk")), col("id"), maxBucket)
      .withColumn("__n", norm(col("__e")))
    val a = base.select(col("__bk"), col("__pass"), col("__sub"),
      col("__sub0").as("__s0a"), col("id"), col("__e").as("__ea"), col("__n").as("__na"))
    val b = base.select(col("__bk"), col("__pass"), col("__sub"),
      col("__sub0").as("__s0b"), col("id").as("nbr"), col("__e").as("__eb"), col("__n").as("__nb"))
    a.join(b, Seq("__bk", "__pass", "__sub"))
      .filter(col("id") =!= col("nbr"))
      .filter(SubBuckets.exactlyOnce(col("__pass"), col("__s0a"), col("__s0b")))
      .select(col("id"), col("nbr"),
        round(graft.functions.DotProduct.dotProduct(col("__ea"), col("__eb"))
          / (col("__na") * col("__nb")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nbr"))).cast("long"))
      .filter(col("rk") <= k)
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

  /** The query vector's bucket computed driver-side with the same
    * arithmetic as the `lshBucket` column (same plane order, ascending-
    * index multiply-add) — identical IEEE operations, so identical sign
    * decisions and an identical bucket value.
    */
  def bucketOf(emb: Array[Double], planes: Int, seed: Long = 42L): Long = {
    val mat = hyperplanes(planes, emb.length, seed)
    var b = 0L
    var p = 0
    while (p < planes) {
      val plane = mat(p)
      var acc = 0.0
      var i = 0
      while (i < emb.length) { acc += emb(i) * plane(i); i += 1 }
      if (acc >= 0) b |= 1L << p
      p += 1
    }
    b
  }

  /** All bucket ids within hamming distance <= slack of `qBucket` over
    * `planes` bits — sum_{i<=slack} C(planes, i) values (697 for 16/3),
    * enumerated driver-side. Filtering with `isin` over this list is
    * equivalent to the hamming predicate `bit_count(b ^ qBucket) <=
    * slack` but PRUNABLE: on a table written partitioned/bucketed by the
    * bucket column it becomes PartitionFilters (a hamming expression
    * never can), so a query touches 697 buckets instead of scanning the
    * full corpus.
    */
  def probeBuckets(qBucket: Long, planes: Int, slack: Int): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    def flip(start: Int, left: Int, mask: Long): Unit = {
      out += (qBucket ^ mask)
      if (left > 0) {
        var i = start
        while (i < planes) { flip(i + 1, left - 1, mask | (1L << i)); i += 1 }
      }
    }
    flip(0, slack, 0L)
    out.result()
  }

  /** LSH-bucketed ANN top-k: the query's bucket and its multi-probe
    * neighborhood (hamming <= probeSlack) are enumerated driver-side
    * (one single-row collect of the query vector, like the IVF centroid
    * path), candidates filtered with `isin` over the probe list, then
    * exact cosine on the candidates. Candidate set is identical to the
    * full-scan hamming filter; the `isin` form is what makes a
    * bucket-partitioned layout prune (see `probeBuckets`).
    */
  def lshTopK(df: DataFrame, embCol: String, idCol: String,
              query: DataFrame, queryEmbCol: String, k: Int,
              planes: Int = 16, probeSlack: Int = 3): DataFrame = {
    val qEmb = query.select(toDouble(col(queryEmbCol)).as("__q"))
      .head().getSeq[Double](0).toArray
    val probes = probeBuckets(bucketOf(qEmb, planes), planes, probeSlack)
    val data = df.select(col(idCol), toDouble(col(embCol)).as("__e"))
      .withColumn("__bucket", lshBucket(col("__e"), planes, qEmb.length))
      .filter(col("__bucket").isin(probes: _*))
    val q = broadcast(query.select(toDouble(col(queryEmbCol)).as("__q")))
    data.crossJoin(q)
      .select(col(idCol), round(cosine(col("__e"), col("__q")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** The pre-fix full-scan formulation (hamming predicate over every
    * row) — kept as the differential reference for the spec proving the
    * probe-enumeration rewrite returns identical rows.
    */
  private[graft] def lshTopKViaScanFilter(df: DataFrame, embCol: String, idCol: String,
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

  /** SemDeDup-style semantic dedup keep-list: within each coarse bucket
    * (a cluster/label id), drop every vector that has a LOWER-id
    * neighbor at cosine >= `threshold`; the lowest id of each similarity
    * neighborhood survives as canonical. This is the per-cluster filter
    * of SemDeDup (Abbas et al. 2023) — not transitive clustering: a
    * vector is judged only against its own above-threshold neighbors.
    *
    * Scale design: candidate pairs come from [[cosinePairs]] (bucket-
    * local, never all-pairs), reduced to a distinct drop-set of ids
    * (narrow shuffle on the id key, materialized once via
    * localCheckpoint — it feeds two consumers). A plain anti join would
    * shuffle the whole corpus WITH vector payloads; instead a bloom
    * filter over the drop-set (one sketch row to the driver, the
    * [[graft.operators.BloomJoin]] shape) splits the corpus in the scan
    * stage: rows the bloom clears are definitely-kept and never shuffle;
    * only the bloom-suspected sliver (true drops + ~3% false positives)
    * reaches the exact anti join, which re-checks ids, so the result is
    * row-identical to the plain anti join at any false-positive rate.
    */
  def semDedup(df: DataFrame, embCol: String, idCol: String,
               bucketCol: String, threshold: Double): DataFrame = {
    val (drop, suspectedOpt) = dropBloom(df, embCol, idCol, bucketCol, threshold)
    suspectedOpt match {
      case None => df // no near-duplicates anywhere
      case Some(suspected) =>
        val cleared = df.filter(!suspected)
        val checked = df.filter(suspected)
          .join(drop, col(idCol).cast("long") === col("__drop"), "left_anti")
        cleared.unionByName(checked)
    }
  }

  /** Builds the drop-set and its membership-test column. The bloom is
    * sized from the TRUE drop-set cardinality (the drop set is already
    * materialized via localCheckpoint, so the count is a cheap second
    * action): a fixed capacity turns into a data-dependent perf cliff —
    * at drop-sets far above it the FPP climbs and the "suspected"
    * sliver that reaches the exact anti join grows toward the whole
    * corpus. Sizing from the count keeps the FPP (and so the verify-side
    * row count, |drops| + FPP·|kept|) at its design point at ANY corpus
    * scale; 25% headroom absorbs estimate slack, and the floor keeps
    * tiny drop sets from degenerating to a handful of hash bits.
    * Exposed private[graft] so the sizing spec can measure the sliver.
    */
  private[graft] def dropBloom(df: DataFrame, embCol: String, idCol: String,
                               bucketCol: String, threshold: Double): (DataFrame, Option[Column]) = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.types.BinaryType

    requireIntegralId(df, idCol)
    val drop = cosinePairs(df, embCol, idCol, bucketCol, threshold)
      .select(col("id_b").as("__drop")).distinct().localCheckpoint()
    val nDrop = drop.count()
    if (nDrop == 0L) (drop, None)
    else {
      val capacity = math.max(1024L, nDrop + (nDrop >> 2))
      val hashedDrop = new XxHash64(Seq(bridge.toExpression(col("__drop").cast("long"))))
      val bytes = drop.groupBy()
        .agg(bridge.toColumn(new BloomFilterAggregate(hashedDrop, capacity)
          .toAggregateExpression()).as("__bf"))
        .head().getAs[Array[Byte]](0)
      (drop, Some(bridge.toColumn(BloomFilterMightContain(
        Literal.create(bytes, BinaryType),
        new XxHash64(Seq(bridge.toExpression(col(idCol).cast("long"))))))))
    }
  }

  /** Embedding near-duplicate pairs: exact cosine inside coarse buckets
    * (provided column, e.g. a cluster/label id) — the verify stage that
    * LSH candidates feed at scale.
    *
    * `maxBucket` bounds pair fan-out the same way
    * [[graft.dedup.Dedup.minhashCandidates]] bounds band buckets: one
    * degenerate bucket (a giant catch-all cluster label) would otherwise
    * emit m^2/2 join pairs at corpus scale. Oversized buckets are split
    * into capped rank-chunk sub-buckets plus a half-offset stitching
    * pass ([[graft.operators.SubBuckets]]): per-bucket pair work becomes
    * LINEAR (≤ m·maxBucket), every pair within rank distance <
    * maxBucket/2 is still found, and healthy buckets (≤ maxBucket) are
    * bit-identical to the uncapped join. The membership window shares
    * the join's bucket clustering (one shuffle; WindowExec spills, so
    * even the degenerate bucket is memory-bounded).
    */
  def cosinePairs(df: DataFrame, embCol: String, idCol: String,
                  bucketCol: String, threshold: Double,
                  maxBucket: Int = 1000): DataFrame = {
    import graft.operators.SubBuckets
    requireIntegralId(df, idCol)
    val base = SubBuckets.withMembership(
        df.select(col(bucketCol).as("__bk"), col(idCol).cast("long").as("id"),
          toDouble(col(embCol)).as("__e")),
        Seq(col("__bk")), col("id"), maxBucket)
      .withColumn("__n", norm(col("__e")))
    val a = base.select(col("__bk"), col("__pass"), col("__sub"),
      col("__sub0").as("__s0a"), col("id").as("id_a"), col("__e").as("__ea"), col("__n").as("__na"))
    val b = base.select(col("__bk"), col("__pass"), col("__sub"),
      col("__sub0").as("__s0b"), col("id").as("id_b"), col("__e").as("__eb"), col("__n").as("__nb"))
    a.join(b, Seq("__bk", "__pass", "__sub"))
      .filter(col("id_a") < col("id_b"))
      .filter(SubBuckets.exactlyOnce(col("__pass"), col("__s0a"), col("__s0b")))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.DotProduct.dotProduct(col("__ea"), col("__eb"))
          / (col("__na") * col("__nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Embedding-space decontamination: for every corpus vector, its
    * nearest benchmark vector by cosine and a flag at `threshold` — the
    * semantic complement of [[graft.dedup.Decontaminate]]'s n-gram
    * overlap (paraphrased test questions share no shingles but sit
    * close in embedding space).
    *
    * Scale shape: benchmark suites are small (thousands of rows), so
    * the bench side BROADCASTS and the corpus is scored in its scan
    * stage — per row one pass over the bench vectors, nothing
    * corpus-sized ever shuffles. The best-match reduce is
    * `max(struct(cos, −bench_id))` (ties break toward the lower bench
    * id, deterministically): because the broadcast join leaves every
    * corpus row in place, the partial aggregate fully collapses each
    * corpus id map-side and the exchange carries ONE narrow row per
    * corpus row — a window top-1 would instead sort |corpus|·|bench|
    * rows after a full shuffle.
    *
    * `sharedIdSpace = true` (default) excludes equal-id pairs — correct
    * when corpus and bench are splits of ONE table (a row must not
    * match itself). Set it false when the two sets have independent id
    * universes, where a numeric collision is a coincidence, not
    * identity — silently skipping that bench row would under-report
    * contamination.
    */
  def crossSetNearDups(corpus: DataFrame, bench: DataFrame, embCol: String,
                       idCol: String, threshold: Double,
                       sharedIdSpace: Boolean = true): DataFrame = {
    requireIntegralId(corpus, idCol)
    // the bench side casts to long too: a non-integral bench id would
    // become null, null the join predicate, and silently drop that
    // bench row — exactly the under-reporting sharedIdSpace warns about
    requireIntegralId(bench, idCol)
    val b = broadcast(bench.select(col(idCol).cast("long").as("bench_id"),
      toDouble(col(embCol)).as("__be"), norm(toDouble(col(embCol))).as("__bn")))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      toDouble(col(embCol)).as("__ce"), norm(toDouble(col(embCol))).as("__cn"))
    val cos = round(graft.functions.DotProduct.dotProduct(col("__ce"), col("__be"))
      / (col("__cn") * col("__bn")), 6)
    c.join(b, if (sharedIdSpace) col("corpus_id") =!= col("bench_id") else lit(true))
      .select(col("corpus_id"), col("bench_id"), cos.as("__cos"))
      .groupBy(col("corpus_id"))
      .agg(max(struct(col("__cos"), (-col("bench_id")).as("__nb"))).as("__best"))
      .select(col("corpus_id"),
        (-col("__best.__nb")).as("bench_id"),
        col("__best.__cos").as("cos_sim"))
      .withColumn("contaminated", col("cos_sim") >= threshold)
  }

  /** The id key is carried as long through pair generation and the
    * semDedup bloom/anti-join — a non-integral id would cast to null and
    * silently match nothing. Fail loudly instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$idCol must be an integral column (got $dt): the long id key would " +
        "cast non-numeric ids to null and drop nothing")
  }
}
