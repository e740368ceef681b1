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

  /** Dominant eigenvector by FIXED-POINT power iteration — the
    * engine-exact sibling of [[pca]]: embeddings quantize to 1e-3
    * resolution longs, the Gram pass rides [[graft.functions.GramAgg]]
    * (integer-valued double sums stay EXACT below 2^53 — certificate-
    * guarded), and every iteration is integer matvec + max-norm
    * truncating-division rescale (Long `/`, matching DuckDB `//`). No floating-point divergence anywhere, so the
    * result is bit-identical across engines/partitionings — unlike an
    * eigensolver, it can sit under a SQL replay oracle.
    *
    * The driver holds only the k×k matrix and the k-vector (k²-bounded
    * by construction, the [[pca]] precedent); the data-scaled work is
    * the one Gram aggregate. Returns the scale-10^4 eigenvector
    * (length `dim`). Resolution: the 1e4 max-norm rescale keeps ~4
    * significant digits per iteration — an audit-grade approximation
    * of the eigendirection, exact as an integer computation.
    *
    * Convergence is gap-driven: error shrinks as (λ2/λ1)^iters, so a
    * flat spectrum needs more rounds (the synthetic corpus has
    * λ2/λ1 ≈ 0.93 — 64 iterations reach cos > 0.999 to the true
    * eigenvector, GraphSpec-pinned; 8 would sit at cos ≈ 0.33).
    */
  def powerIterationFp(df: DataFrame, embCol: String, dim: Int,
                       iters: Int = 8): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fp = df.select(transform(col(embCol),
      x => round(x.cast("double") * 1000).cast("long").cast("double")).as("xf"))
    val flat = fp.agg(graft.functions.GramAgg.gramAgg(col("xf"), dim).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.gram")).collect()
    require(flat.nonEmpty, "powerIterationFp: no valid embedding rows")
    val g = Array.ofDim[Long](dim, dim)
    flat.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = r.getDouble(2)
      require(math.abs(v) < 4.5e15,
        "powerIterationFp: gram magnitude exceeds the exact-integer " +
          "range of the double buffer (2^53 headroom) — shrink the " +
          "quantization scale or shard the corpus")
      g(i)(j) = v.toLong
      g(j)(i) = v.toLong
    }
    val maxG = g.flatten.map(math.abs).max
    val gd = maxG / 1000000L + 1L
    val gs = g.map(_.map(_ / gd))
    var v = Array.fill(dim)(1000L)
    var t = 0
    while (t < iters) {
      val mv = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += gs(i)(j) * v(j); j += 1 }
        s
      }
      val mx = mv.map(math.abs).max
      val dv = mx / 10000L + 1L
      v = mv.map(_ / dv)
      t += 1
    }
    v
  }

  /** Project every embedding onto the fixed-point dominant eigenvector
    * ([[powerIterationFp]]): score = Σ x_fp·v — pure integer per-row
    * fold with the k-vector broadcast as a literal, zero shuffles,
    * engine-exact. Output: idCol, label cols..., score_fp (long). */
  def powerProjectFp(df: DataFrame, embCol: String, idCol: String,
                     dim: Int, iters: Int = 8): DataFrame = {
    val v = powerIterationFp(df, embCol, dim, iters)
    val vLit = typedLit(v.toSeq)
    df.select(col(idCol), col("label").cast("long").as("label"),
      graft.functions.LongDot.longDot(
        transform(col(embCol),
          x => round(x.cast("double") * 1000).cast("long")),
        vLit).as("score_fp"))
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
