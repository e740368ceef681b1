package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sliding token-window chunking as a native Catalyst GENERATOR — the
  * row-producing extension point (the fourth custom-expression surface
  * in this engine, beside scalar expressions, TypedImperativeAggregates
  * and the whole-operator TopKPerGroup pathway).
  *
  * Semantically identical to [[graft.text.Chunker.chunks]]'s composed
  * form (sequence + posexplode + slice + array_join; the differential
  * spec pins the equivalence), but produced in ONE pass over the
  * string: token boundaries are scanned once into an offset array, and
  * each chunk's text is a single substring copy between two boundaries
  * — no token array, no starts array, no per-chunk slice+join
  * allocations. Rows stream from an iterator, so a pathological
  * million-token document never materializes all its chunks at once —
  * the property that matters when chunking 100 TB of unvetted text.
  * Generators run in GenerateExec outside whole-stage codegen either
  * way, so CodegenFallback costs nothing here.
  */
case class ChunkGenerator(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(stride > 0 && window >= stride,
    s"need 0 < stride <= window, got window=$window stride=$stride")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("token_start", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_generator needs a string child, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val text = v.asInstanceOf[UTF8String].toString
    // boundaries(i) = char offset where token i starts; one terminal
    // entry at length+1 so token i spans [boundaries(i), boundaries(i+1)-1)
    val boundaries = ChunkGenerator.tokenStarts(text)
    val nTok = boundaries.length - 1
    new Iterator[InternalRow] {
      private var chunkId = 0
      override def hasNext: Boolean = chunkId == 0 || chunkId * stride < nTok
      override def next(): InternalRow = {
        val start = chunkId * stride
        val end = math.min(start + window, nTok)
        val chunk =
          if (nTok == 0) UTF8String.EMPTY_UTF8
          else UTF8String.fromString(
            text.substring(boundaries(start), boundaries(end) - 1))
        val row = InternalRow(chunkId, start, end - start, chunk)
        chunkId += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkGenerator =
    copy(child = newChild)

  override def prettyName: String = "chunk_generator"
}

object ChunkGenerator {

  /** Char offsets where each single-space-separated token starts, plus
    * one terminal entry at text.length + 1 (as if a trailing separator
    * followed the last token) — token i is text[starts(i), starts(i+1)-1).
    */
  def tokenStarts(text: String): Array[Int] = {
    var n = 1
    var i = 0
    while (i < text.length) { if (text.charAt(i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(n) = text.length + 1
    starts
  }

  /** df => chunk rows (idCol, chunk_id, token_start, n_tokens,
    * chunk_text) — the native-generator twin of Chunker.chunks.
    */
  def chunks(df: DataFrame, textCol: String, idCol: String,
             window: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val gen = bridge.toColumn(
      ChunkGenerator(bridge.toExpression(col(textCol)), window, stride))
    df.select(col(idCol), gen.as(Seq("chunk_id", "token_start", "n_tokens", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long"),
        col("token_start").cast("long").as("token_start"),
        col("n_tokens").cast("long").as("n_tokens"), col("chunk_text"))
  }
}
