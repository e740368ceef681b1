package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for a deterministic synthetic document corpus —
  * the "custom source" extension surface (TableProvider → Table →
  * ScanBuilder → Batch → PartitionReader) built the way a production
  * connector is:
  *
  *   - SPLIT PLANNING: the id space is divided into `numPartitions`
  *     input partitions, so a 1000-executor cluster reads 1000 splits in
  *     parallel — generation happens on executors, nothing on the driver.
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): doc_id range
  *     predicates narrow the id interval BEFORE splits are planned;
  *     splits outside the range simply never exist (the v2 analogue of
  *     partition pruning). Non-id filters are left for Spark to apply.
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only the
  *     requested columns are materialized — pruning `text` skips string
  *     generation entirely, the dominant cost.
  *
  * Rows are a pure function of doc_id (same recipe at any parallelism),
  * so reads are bit-reproducible and the DuckDB oracle can replay the
  * content arithmetically (q_dsv2_source).
  *
  * Options: `numRows` (default 1000), `numPartitions` (default 4).
  */
class SyntheticDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "synthetic-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticDocs {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val Langs: IndexedSeq[String] = IndexedSeq("en", "fr", "de", "es", "zh")

  def lang(id: Long): String = Langs((id % 5).toInt)
  def source(id: Long): String = "src" + (id % 20)
  def nTokens(id: Long): Int = (10 + id % 30).toInt

  /** Deterministic text: nTokens(id) tokens drawn by a fixed recurrence. */
  def text(id: Long): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = nTokens(id)
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append("tok").append((id * 31 + i) % 97)
      i += 1
    }
    sb.toString
  }
}

private[v2] class SyntheticDocsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "synthetic_docs"
  override def schema(): StructType = SyntheticDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // options from getTable(properties) + per-read .option(...) calls
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new SyntheticDocsScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[v2] class SyntheticDocsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val numRows = options.getLong("numRows", 1000L)
  private val numPartitions = options.getInt("numPartitions", 4)

  // doc_id interval [lo, hi) narrowed by pushed range predicates
  private var lo: Long = 0L
  private var hi: Long = numRows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticDocs.Schema
  private var aggOut: Option[Seq[SyntheticDocsAggScan.AggKind]] = None

  // AGGREGATE PUSHDOWN (SupportsPushDownAggregates), COMPLETE form:
  // after the id-range filters narrowed [lo, hi), ungrouped COUNT(*),
  // COUNT(doc_id), MIN(doc_id), MAX(doc_id) are pure range arithmetic —
  // the pushed scan emits ONE row from one partition and generates no
  // data at all (the v2 analogue of answering from parquet footer
  // statistics). Spark calls pushFilters before pushAggregation, so the
  // range is final here; anything unsupported returns false and Spark
  // aggregates normally.
  private def supportedAgg(
      f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc):
      Option[SyntheticDocsAggScan.AggKind] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    def docId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case nr: NamedReference => nr.fieldNames.toSeq == Seq("doc_id")
      case _ => false
    }
    f match {
      case _: CountStar => Some(SyntheticDocsAggScan.CountK)
      case c: Count if !c.isDistinct && docId(c.column) => Some(SyntheticDocsAggScan.CountK)
      case m: Min if docId(m.column) => Some(SyntheticDocsAggScan.MinK)
      case m: Max if docId(m.column) => Some(SyntheticDocsAggScan.MaxK)
      case _ => None
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(supportedAgg(_).isDefined)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggOut = Some(agg.aggregateExpressions.map(supportedAgg(_).get).toSeq)
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = supported
    rest // Spark re-applies anything we did not handle
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggOut match {
    case Some(kinds) =>
      new SyntheticDocsAggScan(math.min(lo, hi) max 0L, hi max 0L, kinds)
    case None =>
      new SyntheticDocsScan(math.min(lo, hi) max 0L, hi max 0L, numPartitions, required)
  }
}

/** Completely-pushed aggregate scan: one partition, one arithmetic row.
  * Empty range → COUNT 0, MIN/MAX null (Spark's empty-input semantics).
  * Single partition is REQUIRED for complete pushdown: Spark plans no
  * merge above it, so two partitions would mean two result rows. */
private[v2] object SyntheticDocsAggScan {
  sealed trait AggKind
  case object CountK extends AggKind
  case object MinK extends AggKind
  case object MaxK extends AggKind
}

private[v2] class SyntheticDocsAggScan(lo: Long, hi: Long,
                                       kinds: Seq[SyntheticDocsAggScan.AggKind])
    extends Scan with Batch {
  import SyntheticDocsAggScan._
  override def readSchema(): StructType =
    StructType(kinds.zipWithIndex.map { case (k, i) =>
      StructField(s"agg_$i", LongType, nullable = k != CountK)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs PUSHED-AGG range=[$lo,$hi) aggs=[${kinds.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    SyntheticDocsAggReaderFactory(kinds)
}

/** Standalone (serializable) factory — must not capture the Scan. */
private[v2] case class SyntheticDocsAggReaderFactory(
    kinds: Seq[SyntheticDocsAggScan.AggKind]) extends PartitionReaderFactory {
  import SyntheticDocsAggScan._
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IdRangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = p.end <= p.start
        InternalRow.fromSeq(kinds.map {
          case CountK => math.max(0L, p.end - p.start)
          case MinK   => if (empty) null else p.start
          case MaxK   => if (empty) null else p.end - 1
        }.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

private[v2] case class IdRangePartition(start: Long, end: Long) extends InputPartition

private[v2] class SyntheticDocsScan(lo: Long, hi: Long, numPartitions: Int,
                                    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo,$hi) parts=$numPartitions cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, numPartitions)
    val span = math.max(0L, hi - lo)
    (0 until n).iterator.map { i =>
      IdRangePartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required)
}

private[v2] class SyntheticDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IdRangePartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      // one generator per required column, bound once (not per row)
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "doc_id" => (i: Long) => i
          case "lang"   => (i: Long) => UTF8String.fromString(SyntheticDocs.lang(i))
          case "source" => (i: Long) => UTF8String.fromString(SyntheticDocs.source(i))
          case "text"   => (i: Long) => UTF8String.fromString(SyntheticDocs.text(i))
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
