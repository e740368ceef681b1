package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate a k× scaled copy of an sf directory's DOCUMENT-side tables
  * (documents + embeddings — the inputs of the incremental/pipeline
  * suite) for the measured-decade scaling run (VERDICT r14 #5). The
  * scaling convention is the stress harness's replica trick: ids offset
  * per copy, every token suffixed per copy (cross-copy vocabularies
  * disjoint — vocabulary grows LINEARLY, the adversarial Heaps bound),
  * embeddings shared per base id (exact-copy semantic matches, the
  * sparse regime the gate is for). Writes under the given output dir;
  * the TPC-H tables are not scaled — the incremental suite never reads
  * them.
  *
  * Usage: Test/runMain graft.tools.GenScaledSf <srcSfDir> <outDir> <k>
  */
object GenScaledSf {

  /** Write the scaled tables; returns (documents, embeddings) counts.
    * Invariants (pinned by GenScaledSfSpec): BOTH tables offset by the
    * DOC span — vec_ids are a subset of the doc_id space (the semantic
    * pipeline queries join doc_id = vec_id), so independent spans would
    * pair copy-i embeddings with copy-j text; copy-i text is the base
    * text with every token suffixed `~si` (disjoint vocabularies); the
    * embedding VECTORS are bit-identical per copy (exact-copy semantic
    * matches). */
  def generate(spark: SparkSession, src: String, out: String,
               k: Int): (Long, Long) = {
    val docs = spark.read.parquet(s"$src/documents.parquet").localCheckpoint()
    val docSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val emb = spark.read.parquet(s"$src/embeddings.parquet").localCheckpoint()

    def tiled(i: Int) =
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * docSpan))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"~s$i"))),
          " "))
    (1 until k).foldLeft(tiled(0))((a, i) => a.unionByName(tiled(i)))
      .coalesce(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
    (1 until k).foldLeft(emb)((a, i) => a.unionByName(
        emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * docSpan))))
      .coalesce(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    (nd, ne)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sfscale/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (nd, ne) = generate(spark, src, out, k)
    println(s"""GEN_SCALED {"src":"$src","out":"$out","k":$k,"documents":$nd,"embeddings":$ne}""")
    spark.stop()
  }
}
