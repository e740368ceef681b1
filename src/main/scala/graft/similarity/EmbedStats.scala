package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-moment statistics over an embedding column — the input to
  * PCA/whitening and to covariance-based drift monitors, computed as a
  * single distributed pass.
  */
object EmbedStats {

  /** Gram matrix G[i][j] = Σ_rows v_i * v_j (upper triangle, i <= j),
    * plus the per-dimension mean — everything PCA needs (covariance =
    * G/n − mean·meanᵀ; eigendecompose the k×k result anywhere, it is
    * tiny).
    *
    * Scale shape: each row explodes to its k² outer-product entries,
    * but the groupBy(i,j) hash aggregate collapses them map-side — the
    * exchange carries at most k² rows PER PARTITION, independent of row
    * count, and the final stage is k² groups. For k where k² per-row
    * expansion is too hot (k ≳ 10³), the same contract would move into
    * a TypedImperativeAggregate holding a k²/2 buffer; at typical
    * embedding widths the explode keeps everything in codegen'd
    * built-ins. Elements are cast to double BEFORE multiplying so the
    * arithmetic is engine-reproducible (float multiply then double sum
    * is not).
    *
    * Output: `i`, `j` (0-based ints, i <= j), `gram` = Σ v_i·v_j,
    * `mean_i` = mean of dimension i, `n` rows — all rounded to 6.
    */
  /** [[gramMatrix]] through the [[graft.functions.GramAgg]] flat-buffer
    * aggregate — identical output schema/values (GraphSpec differential-
    * pins it), but each partition ships one ≈17 KB blob instead of k²
    * aggregation rows, and no k²-entry row stream ever materializes.
    * This is the production path; the explode form remains as the
    * all-built-ins reference implementation.
    */
  def gramMatrixAgg(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.agg(graft.functions.GramAgg.gramAgg(col(embCol), dim).as("__g"))
      .select(explode(col("__g")).as("g"))
      .select(col("g.i").as("i"), col("g.j").as("j"),
        round(col("g.gram"), 6).as("gram"),
        round(col("g.mean_i"), 6).as("mean_i"),
        col("g.n").as("n"))
  }

  /** PCA from the Gram pass: covariance = G/n − mean·meanᵀ is assembled
    * from [[gramMatrixAgg]]'s UNROUNDED aggregate (k×k, collected to the
    * driver — 2080 doubles at k=64, the one legitimate driver-side step),
    * eigendecomposed with breeze, and the top-`m` components returned
    * with a deterministic sign convention (largest-|coefficient| entry
    * positive). Eigenvalues come back descending.
    */
  def pca(df: DataFrame, embCol: String, dim: Int, m: Int):
      (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(m > 0 && m <= dim, s"need 0 < m <= dim, got m=$m dim=$dim")
    val flat = df.agg(graft.functions.GramAgg.gramAgg(col(embCol), dim).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.gram"), col("e.mean_i"), col("e.n"))
      .collect()
    require(flat.nonEmpty, "pca: no valid embedding rows")
    val n = flat.head.getLong(4).toDouble
    val means = new Array[Double](dim)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    flat.foreach { r =>
      val (i, j, g, mi) = (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))
      means(i) = mi
      cov(i, j) = g / n
      cov(j, i) = g / n
    }
    for (i <- 0 until dim; j <- 0 until dim)
      cov(i, j) -= means(i) * means(j)
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; take the top m, largest first
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(m)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(i => es.eigenvectors(i, c))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    (means, comps, order.map(es.eigenvalues(_)).toArray)
  }

  /** Project each embedding onto the top-`m` principal components:
    * means and components ride into the plan as literals (the broadcast-
    * a-small-model degenerate case, like Curation.scoreLinear), so the
    * projection is a zero-shuffle scan — `pc1..pcm` per row.
    */
  def pcaProject(df: DataFrame, embCol: String, idCol: String,
                 dim: Int, m: Int): DataFrame = {
    val (means, comps, _) = pca(df, embCol, dim, m)
    val meanLit = typedLit(means.toSeq)
    val centered = transform(col(embCol),
      (x, i) => x.cast("double") - element_at(meanLit, i + 1))
    val scores = comps.zipWithIndex.map { case (w, c) =>
      round(aggregate(
        zip_with(centered, typedLit(w.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x), 6).as(s"pc${c + 1}")
    }
    df.select(col(idCol) +: scores: _*)
  }

  def gramMatrix(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val v = transform(col(embCol), x => x.cast("double"))
    // each entry carries (product, row's value of dim i) so the aggregate
    // below gets both without re-carrying the whole vector per entry
    val outer = flatten(transform(v, x =>
      transform(v, y => struct((x * y).as("xy"), x.as("vi")))))
    df.select(posexplode(outer).as(Seq("pos", "e")))
      .select((col("pos") / dim).cast("int").as("i"),
        (col("pos") % dim).cast("int").as("j"),
        col("e.xy").as("xy"), col("e.vi").as("vi"))
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("xy")), 6).as("gram"),
        round(avg(col("vi")), 6).as("mean_i"),
        count(lit(1)).as("n"))
  }
}
