package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Incremental IVF: the persisted, append-only face of [[Ivf]] — the
  * embedding-side mirror of [[graft.dedup.IncrementalDedup]]. A 100 TB
  * vector corpus is not re-indexed because a batch arrived: centroids
  * are trained ONCE (on the first ingest, or any representative
  * sample), pinned, and every later batch is assigned scan-side against
  * those pinned centroids and APPENDED to a
  * [[graft.sources.VersionedTable]] — ingest N+1 never re-assigns or
  * re-reads ingest N. Per-batch cost is O(batch × nCells × dim), all
  * map-side.
  *
  * Index row schema: `id: long, cell_id: int, vec: array<double>,
  * batch: long`. Storing the assignment (not just the vector) is the
  * incremental win at query time too: search filters `cell_id` on the
  * SCAN — written out partitioned/bucketed by `cell_id` the probe
  * becomes partition pruning — instead of re-running the argmin over
  * the whole corpus per query.
  *
  * Pinned centroids drift as the distribution shifts; [[assignStats]]
  * is the refusal-style guard (the adaptive-dedup pattern): per-batch
  * mean/max assignment distance, compared across batches, says
  * "retrain" BEFORE recall silently decays. Retraining writes a new
  * index (new table), cut over atomically by the caller — the old
  * index stays queryable throughout (time travel preserves even its
  * history).
  */
object IncrementalIvf {

  /** Assign `batch` against the pinned centroids and append it to the
    * index atomically. `(txnApp, txn)` makes re-ingest idempotent (the
    * streamingCommitSink rule): a replayed batch appends nothing.
    */
  def addBatch(spark: SparkSession, batch: DataFrame, embCol: String,
               idCol: String, cents: Seq[Ivf.Centroid], table: String,
               batchId: Long, txnApp: Option[String] = None,
               txn: Option[Long] = None): Unit = {
    val replayed = txnApp.zip(txn).exists { case (app, t) =>
      VersionedTable.txnMaxes(table).get(app).exists(_ >= t)
    }
    if (!replayed) {
      val rows = batch
        .select(col(idCol).cast("long").as("id"),
          Similarity.toDouble(col(embCol)).cast("array<double>").as("vec"))
        .withColumn("cell_id", Ivf.assignCell(col("vec"), cents))
        .select(col("id"), col("cell_id"),
          col("vec").cast("array<double>").as("vec"),
          lit(batchId).as("batch"))
      VersionedTable.commit(rows, table, "append", txn, txnApp,
        expectedVersion = None)
    }
  }

  /** Top-k cosine over the persisted index at `version` (default:
    * latest): probe the nProbe cells nearest the query (computed
    * driver-side over the centroid table), exact-cosine only rows whose
    * STORED `cell_id` is probed. Output: `id, cos_sim`.
    */
  def searchTopK(spark: SparkSession, table: String,
                 cents: Seq[Ivf.Centroid], query: DataFrame,
                 queryEmbCol: String, k: Int, nProbe: Int,
                 version: Option[Long] = None): DataFrame = {
    val df = version
      .map(v => VersionedTable.readVersion(spark, table, v))
      .getOrElse(VersionedTable.read(spark, table))
    val qVec = query.select(Similarity.toDouble(col(queryEmbCol)).as("__q"))
      .head().getSeq[Double](0)
    val probes = cents
      .map(c => c.cellId -> c.values.zip(qVec)
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      .sortBy { case (id, dd) => (dd, id) }
      .take(nProbe).map(_._1)
    val q = broadcast(query
      .select(Similarity.toDouble(col(queryEmbCol)).as("__q"))
      .withColumn("__qn", Similarity.norm(col("__q"))))
    df.select(col("id"), col("cell_id"), col("vec"))
      .filter(col("cell_id").isin(probes: _*))
      .crossJoin(q)
      .select(col("id"),
        round(graft.functions.DotProduct.dotProduct(col("vec"), col("__q"))
          / (Similarity.norm(col("vec")) * col("__qn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id"))
      .limit(k)
  }

  /** Structured Streaming ingest: each micro-batch is assigned against
    * the pinned centroids and appended with `(appId, batchId)` txn
    * identity, so checkpoint replays append nothing — the index is
    * exactly-once. The vector stream becomes a continuously queryable
    * ANN index (each committed version a consistent snapshot).
    */
  def streamingSink(vecs: DataFrame, embCol: String, idCol: String,
                    cents: Seq[Ivf.Centroid], table: String, appId: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        addBatch(batch.sparkSession, batch, embCol, idCol, cents, table,
          batchId, txnApp = Some(appId), txn = Some(batchId))
    }

  /** Per-batch assignment-distance stats over the index — the drift
    * guard. A rising `mean_dist` across batches means the pinned
    * centroids no longer describe the incoming distribution: retrain
    * and cut over. Output: `batch, n, mean_dist, max_dist`.
    */
  def assignStats(spark: SparkSession, table: String,
                  cents: Seq[Ivf.Centroid]): DataFrame = {
    val arr = {
      import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      org.apache.spark.sql.graft.bridge.toColumn(
        CatLit.create(cents.map(_.values.toArray).toArray,
          ArrayType(ArrayType(DoubleType, false), false)))
    }
    val dist = sqrt(aggregate(
      zip_with(col("vec"), element_at(arr, col("cell_id") + 1),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))
    VersionedTable.read(spark, table)
      .select(col("batch"), dist.as("__d"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__d")), 6).as("mean_dist"),
        round(max(col("__d")), 6).as("max_dist"))
  }
}
