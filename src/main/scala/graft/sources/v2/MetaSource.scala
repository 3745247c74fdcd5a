package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector emulating the reference's paged Meta Ads REST
  * scan (SURVEY §2.1 S1/S4-S6): `spark.read.format("graft-meta")`.
  *
  * The reference extractors page through a remote cursor
  * (/root/reference/src/extract.py:114-136, limit=1000 pages) with
  * server-side `effective_status` filtering (extract.py:125-127) and
  * explicit `fields=` lists (column pruning). This connector reproduces
  * that shape through the real DSv2 stack:
  *
  *  - **partition planning**: each cursor page becomes an
  *    `InputPartition` — on a cluster, pages are fetched concurrently by
  *    executors instead of the reference's sequential driver loop;
  *  - **SupportsPushDownFilters**: `effective_status IN/=` is accepted
  *    and evaluated "server-side" (inside the reader, before rows are
  *    emitted) — the DSv2 restatement of the API's filtering param;
  *  - **SupportsPushDownRequiredColumns**: the reader materializes only
  *    requested fields — the `fields=` list.
  *
  * The "remote API" itself is a deterministic generator (pure arithmetic
  * on the row index — this environment has no egress), so query results
  * are oracle-checkable; swap [[MetaAdsPage.record]] for an HTTP fetch to
  * target the live endpoint.
  *
  * Options: `rows` (total rows behind the cursor, default 5000),
  * `pageSize` (default 1000).
  */
class MetaSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-meta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MetaSource.AdsSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // option keys arrive case-preserved here (unlike inferSchema's map)
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    new MetaAdsTable(
      opts.getOrElse("rows", "5000").toLong,
      opts.getOrElse("pagesize", "1000").toInt)
  }
}

object MetaSource {
  private val IdName = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  /** The /ads record shape (FIXTURES.md §A1). */
  val AdsSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("adset", IdName),
    StructField("campaign", IdName),
    StructField("effective_status", StringType),
    StructField("_ingest_order", LongType)))

  val Statuses: Array[String] =
    Array("ACTIVE", "PAUSED", "PENDING_REVIEW", "DISAPPROVED")
}

class MetaAdsTable(rows: Long, pageSize: Int) extends Table
    with SupportsRead {
  override def name(): String = s"graft_meta_ads(rows=$rows)"
  override def schema(): StructType = MetaSource.AdsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new MetaScanBuilder(rows, pageSize)
}

class MetaScanBuilder(rows: Long, pageSize: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = MetaSource.AdsSchema
  private var statusFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case In("effective_status", vs) => true
      case EqualTo("effective_status", _) => true
      case IsNotNull("effective_status") => true
      case _ => false
    }
    statusFilter = {
      val vals = accepted.flatMap {
        case In(_, vs) => vs.map(_.toString)
        case EqualTo(_, v) => Array(v.toString)
        case _ => Array.empty[String]
      }
      if (vals.isEmpty) None else Some(vals.toSet)
    }
    pushed = accepted
    rejected // Spark re-applies anything we don't handle
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new MetaScan(rows, pageSize, required,
    statusFilter)
}

class MetaScan(rows: Long, pageSize: Int, required: StructType,
    statusFilter: Option[Set[String]]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-meta ads scan, PushedStatusFilter=${statusFilter.getOrElse("-")}" +
      s", ReadSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    (0L until rows by pageSize.toLong)
      .map(s => MetaAdsPage(s, math.min(s + pageSize, rows)))
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new MetaReaderFactory(required, statusFilter)

  /** Test/inspection hooks. */
  def pushedStatusFilter: Option[Set[String]] = statusFilter
  def requiredColumns: Seq[String] = required.fieldNames.toSeq
}

/** One cursor page. */
case class MetaAdsPage(start: Long, end: Long) extends InputPartition

object MetaAdsPage {
  /** The deterministic "remote" record for global row index i — swap for
    * an HTTP fetch to hit the real endpoint. Arithmetic mirrors
    * MetaFixtures so a SQL oracle can replay it over range(). */
  def record(i: Long): Map[String, Any] = {
    val user = i % 150
    Map(
      "id" -> s"ad_$user",
      "name" -> s"ad $user v${i % 3}",
      "adset" -> (s"as_${user % 7}", s"adset ${user % 7}"),
      "campaign" -> (s"c_${user % 3}", s"campaign ${user % 3}"),
      "effective_status" -> MetaSource.Statuses((i % 4).toInt),
      "_ingest_order" -> i)
  }
}

class MetaReaderFactory(required: StructType,
    statusFilter: Option[Set[String]]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[MetaAdsPage]
    new PartitionReader[InternalRow] {
      private var i = page.start - 1
      private var current: InternalRow = _

      private def toRow(rec: Map[String, Any]): InternalRow = {
        val vals = required.fields.map { f =>
          (f.dataType, rec(f.name)) match {
            case (StringType, s: String) => UTF8String.fromString(s)
            case (LongType, l: Long) => java.lang.Long.valueOf(l)
            // nested pruning: build the struct with exactly the fields
            // Spark asked for (may be just {name} or {id})
            case (st: StructType, (id: String, nm: String)) =>
              new GenericInternalRow(st.fields.map(sf =>
                UTF8String.fromString(
                  if (sf.name == "id") id else nm)): Array[Any])
            case (t, v) =>
              throw new IllegalStateException(
                s"unexpected field ${f.name}: $t = $v")
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }

      override def next(): Boolean = {
        var found = false
        while (!found && i + 1 < page.end) {
          i += 1
          val rec = MetaAdsPage.record(i)
          // "server-side" filter: applied before the row leaves the page
          if (statusFilter.forall(_.contains(
              rec("effective_status").asInstanceOf[String]))) {
            current = toRow(rec)
            found = true
          }
        }
        found
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
