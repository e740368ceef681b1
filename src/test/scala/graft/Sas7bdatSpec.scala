package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The sas7bdat source (SURVEY §2.1 S4 — the reference's one input format
  * the engine had not opened). The reference's actual April-2016 binary is
  * not bundled, so the gate is two-sided instead:
  *   - full round-trip equality against the reference's 3,096,313-row
  *     parquet mirror (`sas_data/`), written through [[Sas7bdat.write]]
  *     and read back in parallel through [[Sas7bdat.read]];
  *   - this writer's output is additionally cross-read with
  *     `pd.read_sas` — an independent implementation of the same public
  *     spec — in tools/check_sas7bdat_pandas.py (result recorded in
  *     FIXTURES.md).
  */
class Sas7bdatSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpFile(tag: String): String =
    Files.createTempDirectory(s"graft-sas-$tag").resolve(s"$tag.sas7bdat").toString

  test("round-trip: both SAS types, missing numerics and blank strings -> null") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String, java.lang.Double, String)](
      (1.0, "alpha", 3.25, "x"),
      (2.0, null, Double.NegativeInfinity, ""),       // empty string = SAS missing
      (3.0, "trailing  ", null, "éü"),                // latin1 beyond ascii
      (4.0, "q", -0.0, "endsz")
    ).toDF("id", "s1", "v", "s2")
    val path = tmpFile("small")
    val cols = Sas7bdat.writeDataFrame(df, path)
    assert(cols.map(_.name) == Seq("id", "v", "s1", "s2")) // numerics first

    val back = Sas7bdat.read(spark, path).select("id", "s1", "v", "s2")
    assert(back.schema == StructType(Seq(
      StructField("id", DoubleType), StructField("s1", StringType),
      StructField("v", DoubleType), StructField("s2", StringType))))
    val rows = back.collect().sortBy(_.getDouble(0)).toSeq
    // SAS semantics: blanks (and blank-padded tails) trim; "" and null
    // both come back null; -inf/-0.0 survive bit-exact
    assert(rows == Seq(
      Row(1.0, "alpha", 3.25, "x"),
      Row(2.0, null, Double.NegativeInfinity, null),
      Row(3.0, "trailing", null, "éü"),
      Row(4.0, "q", -0.0, "endsz")))
  }

  test("metadata inspect: layout, row length, counts, no compression") {
    import spark.implicits._
    val df = Seq((1.0, "ab"), (2.0, "c")).toDF("n", "s")
    val path = tmpFile("meta")
    Sas7bdat.writeDataFrame(df, path)
    val meta = Sas7bdat.inspect(path)
    assert(meta.u64 && meta.littleEndian && meta.compression.isEmpty)
    assert(meta.rowCount == 2 && meta.rowLength == 10) // 8 + max-width 2
    assert(meta.columns == Seq(
      Sas7bdat.SasColumn("n", 0, 8, numeric = true),
      Sas7bdat.SasColumn("s", 8, 2, numeric = false)))
    assert(meta.mixPageRowCount == 2) // both rows fit on the mix page
  }

  test("truncated numerics (width 3..8) decode as the high-order double bytes") {
    val d = 1234.5678
    val full = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(full).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(0, d)
    for (w <- 3 to 8) {
      // SAS keeps the w most significant bytes: LE tail of the buffer
      val page = full.takeRight(w)
      val got = Sas7bdat.decodeNumeric(page, 0, w).asInstanceOf[Double]
      val expectBits = java.lang.Double.doubleToLongBits(d) >>> (8 * (8 - w)) << (8 * (8 - w))
      assert(got == java.lang.Double.longBitsToDouble(expectBits), s"width $w")
    }
    // whole-width NaN payload is missing
    val nan = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(nan).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(0, 0xFFFFFE0000000000L) // SAS "." bit pattern seen in real files
    assert(Sas7bdat.decodeNumeric(nan, 0, 8) == null)
  }

  test("multi-page files split into parallel page-range partitions") {
    import spark.implicits._
    // small pages force many pages; small target forces many partitions
    val df = (0 until 5000).map(i => (i.toDouble, s"v$i")).toDF("i", "s")
    val path = tmpFile("pages")
    Sas7bdat.writeDataFrame(df, path, pageSize = 4096)
    val meta = Sas7bdat.inspect(path)
    assert(meta.nPages > 10, s"expected many pages, got ${meta.nPages}")
    val back = Sas7bdat.read(spark, path, targetPartitionBytes = 16 * 4096)
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() == 5000)
    assert(back.agg(sum("i")).head.getDouble(0) == (4999.0 * 5000 / 2))
  }

  test("full gate: the 3,096,313-row reference mirror survives the round-trip") {
    val mirror = spark.read.parquet("/root/reference/sas_data")
    val path = tmpFile("i94")
    val cols = Sas7bdat.writeDataFrame(mirror, path, datasetName = "I94_APR16")
    assert(cols.size == 28)

    val back = Sas7bdat.read(spark, path).select(
      mirror.schema.fieldNames.map(col).toIndexedSeq: _*)
    assert(back.schema == mirror.schema.copy(fields =
      mirror.schema.fields.map(_.copy(nullable = true))))

    // order-independent equality: per-column null counts + a content hash
    // summed over rows (xxhash64 over every column, null-tagged)
    def digest(df: org.apache.spark.sql.DataFrame): Row = {
      val hashAll = sum(xxhash64(df.schema.fieldNames.map(col).toIndexedSeq: _*)
        .cast(DecimalType(38, 0)))
      val nulls = df.schema.fieldNames.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_$c"))
      df.agg(count(lit(1)).as("n"), (hashAll +: nulls.toIndexedSeq): _*).head
    }
    val (a, b) = (digest(mirror), digest(back))
    assert(a == b, s"mirror digest $a != round-trip digest $b")
    assert(a.getLong(0) == 3096313L)
    Files.deleteIfExists(java.nio.file.Paths.get(path))
  }
}
