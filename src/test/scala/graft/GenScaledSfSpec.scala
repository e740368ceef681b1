package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scaled-corpus generator's invariants (the decade scaling
  * run's input — BENCH_SCALING_r15.json is only as good as these):
  * copy-aligned ids (BOTH tables offset by the DOC span, because the
  * semantic pipeline queries join doc_id = vec_id — the bug class this
  * spec exists for is independent spans pairing copy-i embeddings with
  * copy-j text), per-copy-disjoint vocabularies, and bit-identical
  * embedding vectors per copy.
  */
class GenScaledSfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scaled copies keep doc/embedding pairing, disjoint vocab, shared vectors") {
    val out = java.nio.file.Files.createTempDirectory("graft-genscaled")
      .toString
    val src = "/root/testdata/sf0.001"
    val (nd, ne) = tools.GenScaledSf.generate(spark, src, out, k = 3)

    val baseDocs = spark.read.parquet(s"$src/documents.parquet")
    val baseEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(nd == 3 * baseDocs.count() && nd == docs.count())
    assert(ne == 3 * baseEmb.count() && ne == emb.count())

    val docSpan = baseDocs.agg(max(col("doc_id"))).head().getLong(0) + 1

    // copy alignment: EVERY scaled embedding id joins a scaled doc of
    // the SAME copy (vec_ids ⊂ doc_id space per copy, both offset by
    // docSpan) — an inner join on ids recovers exactly ne rows and the
    // copy index derived from each side agrees
    val joined = emb.select(col("vec_id"))
      .join(docs.select(col("doc_id")), col("vec_id") === col("doc_id"))
    assert(joined.count() == ne, "every embedding pairs with its copy's doc")

    // disjoint vocab: copy-i text = base text with every token
    // suffixed ~si — replaying the transform on the base reproduces
    // copy 1..k-1 byte-for-byte (and copy 0 is the base verbatim)
    val replay = (0 until 3).map { i =>
      if (i == 0) baseDocs.select(col("doc_id"), col("text"))
      else baseDocs.select(
        (col("doc_id") + lit(i.toLong * docSpan)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"~s$i"))), " ").as("text"))
    }.reduce(_ unionByName _)
    assert(docs.select(col("doc_id"), col("text"))
      .exceptAll(replay).isEmpty, "scaled text replays exactly")

    // shared vectors: copy-i's embedding for base id b is bit-identical
    // to the base embedding of b
    val mismatch = emb
      .select(pmod(col("vec_id"), lit(docSpan)).as("__b"),
        col("embedding").as("__e"))
      .join(baseEmb.select(col("vec_id").as("__b"),
        col("embedding").as("__base_e")), Seq("__b"))
      .filter(col("__e") =!= col("__base_e"))
    assert(mismatch.isEmpty, "copies share their base doc's vector")
  }
}
