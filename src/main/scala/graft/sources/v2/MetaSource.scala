package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, FieldReference, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
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
  *    requested fields — the `fields=` list;
  *  - **SupportsPushDownLimit**: page scans stop emitting once the limit
  *    is satisfied — the cursor is never advanced past what the query
  *    needs (per-partition cap; Spark re-applies the global limit);
  *  - **SupportsPushDownAggregates** (complete pushdown): GROUP BY +
  *    COUNT/COUNT DISTINCT/MIN/MAX/SUM over flat columns are answered by
  *    the "server" — the DSv2 restatement of the reference's
  *    `level`/`time_increment`/`breakdowns` params asking the API to
  *    pre-aggregate (extract.py:199-207, SURVEY §4 "aggregate pushdown").
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
    if ("insights".equalsIgnoreCase(options.getOrDefault("endpoint", "ads")))
      MetaSource.InsightsSchema
    else MetaSource.AdsSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // option keys arrive case-preserved here (unlike inferSchema's map)
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    // S1 credential check (reference extract.py:22-24): targeting the
    // live endpoint requires the full credential set up front — fail the
    // table resolution, not the first task, and name what's missing.
    // The deterministic generator (the default) needs none.
    if (opts.get("live").exists(v => "true".equalsIgnoreCase(v.trim))) {
      val required =
        Seq("app_id", "app_secret", "access_token", "ad_account_id")
      // trim before the emptiness check so a whitespace-only credential
      // fails fast like a missing one (consistent with live's trimming)
      val missing = required.filter(k => opts.get(k).forall(_.trim.isEmpty))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"graft-meta: live=true but credential option(s) missing: " +
            missing.mkString(", "))
    }
    if (opts.get("endpoint").exists("insights".equalsIgnoreCase))
      new MetaInsightsTable(
        opts.getOrElse("days", "3").toInt,
        opts.getOrElse("ads", "150").toLong,
        opts.getOrElse("dayspertrigger", "1").toInt)
    else
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

  private val ActionEntry = StructType(Seq(
    StructField("action_type", StringType),
    StructField("value", StringType)))

  /** The /insights raw-pull record shape — exactly what the reference's
    * incremental extractor hands the transform
    * (src/extract.py:199-207 fields; string-typed metrics, the
    * `actions`/`action_values` arrays), i.e.
    * [[graft.sources.MetaFixtures.rawInsights]]'s schema. */
  val InsightsSchema: StructType = StructType(Seq(
    StructField("date_start", StringType),
    StructField("ad_id", StringType),
    StructField("adset_id", StringType),
    StructField("campaign_id", StringType),
    StructField("impressions", StringType),
    StructField("clicks", StringType),
    StructField("spend", StringType),
    StructField("actions", ArrayType(ActionEntry)),
    StructField("action_values", ArrayType(ActionEntry))))
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

/** One pushed-down aggregate function over a flat column. `col = None` is
  * COUNT(*). Result types follow the evaluation: counts → Long, SUM(Long)
  * → Long, MIN/MAX → the column's own type (Spark casts the scan output to
  * the Catalyst result type itself for complete pushdown). */
private[v2] case class PushedAggFunc(kind: String, col: Option[String],
    distinct: Boolean) {
  def resultType: DataType = kind match {
    case "count" => LongType
    case "sum" => LongType
    case _ => // min/max preserve the column type
      MetaSource.AdsSchema(col.get).dataType
  }
  override def toString: String =
    s"$kind(${if (distinct) "DISTINCT " else ""}${col.getOrElse("*")})"
}

private[v2] case class PushedAggregation(groupCols: Seq[String],
    funcs: Seq[PushedAggFunc]) {
  def outputSchema: StructType = StructType(
    groupCols.map(c => MetaSource.AdsSchema(c)) ++
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i(${f.toString})", f.resultType) })
}

class MetaScanBuilder(rows: Long, pageSize: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var required: StructType = MetaSource.AdsSchema
  private var statusFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var topN: Option[(Boolean, Int)] = None // (descending, n)
  private var agg: Option[PushedAggregation] = None

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
    // after a complete aggregate pushdown the output schema is fixed by
    // the aggregation; column pruning no longer applies
    if (agg.isEmpty) required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  // each page caps its own cursor at n; Spark re-applies the global limit
  override def isPartiallyPushed: Boolean = true

  /** ORDER BY _ingest_order [ASC|DESC] LIMIT n — the cursor column is the
    * scan's own emission order, so the "server" answers a top-n by
    * clamping the cursor to the head (asc) or tail (desc) of the range.
    * Spark still re-sorts the n returned rows (isPartiallyPushed). */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector
      .expressions.SortOrder], n: Int): Boolean = orders match {
    case Array(o) => flatCol(o.expression()) match {
      case Some("_ingest_order") if statusFilter.isEmpty =>
        topN = Some((o.direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection
            .DESCENDING, n))
        true
      case _ => false
    }
    case _ => false
  }

  /** Flat (non-struct) column name, or None if unsupported. */
  private def flatCol(e: V2Expression): Option[String] = e match {
    case ref: NamedReference if ref.fieldNames.length == 1 &&
        MetaSource.AdsSchema.fieldNames.contains(ref.fieldNames.head) &&
        !MetaSource.AdsSchema(ref.fieldNames.head).dataType
          .isInstanceOf[StructType] =>
      Some(ref.fieldNames.head)
    case _ => None
  }

  private def translate(a: Aggregation): Option[PushedAggregation] = {
    val groups = a.groupByExpressions.toSeq.map(flatCol)
    val funcs = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(PushedAggFunc("count", None, distinct = false))
      case c: Count =>
        flatCol(c.column).map(n =>
          PushedAggFunc("count", Some(n), c.isDistinct))
      case m: Min => flatCol(m.column).map(c =>
        PushedAggFunc("min", Some(c), distinct = false))
      case m: Max => flatCol(m.column).map(c =>
        PushedAggFunc("max", Some(c), distinct = false))
      case s: Sum if !s.isDistinct => flatCol(s.column).collect {
        // SUM only over the long cursor column — string sums stay unpushed
        case c if MetaSource.AdsSchema(c).dataType == LongType =>
          PushedAggFunc("sum", Some(c), distinct = false)
      }
      case _ => None
    }
    if (groups.forall(_.isDefined) && funcs.forall(_.isDefined) &&
        funcs.nonEmpty)
      Some(PushedAggregation(groups.flatten, funcs.flatten))
    else None
  }

  override def supportCompletePushDown(a: Aggregation): Boolean =
    translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean =
    translate(a) match {
      case some @ Some(_) => agg = some; true
      case None => false
    }

  override def build(): Scan = new MetaScan(rows, pageSize, required,
    statusFilter, limit, agg, topN)
}

class MetaScan(rows: Long, pageSize: Int, required: StructType,
    statusFilter: Option[Set[String]], limit: Option[Int] = None,
    agg: Option[PushedAggregation] = None,
    topN: Option[(Boolean, Int)] = None) extends Scan with Batch
    with SupportsReportStatistics {

  /** Size/row estimates so the planner can make broadcast decisions about
    * this source the way parquet relations get them from file sizes.
    * Accounts for everything pushed: the topN/limit row caps and the
    * status filter's selectivity (statuses are uniform quarters of the
    * cursor) — a limited/filtered scan must not report the full cursor
    * or the planner will refuse a broadcast that is actually correct. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n: Long = {
      val scanned = scanEnd - scanStart
      val filtered = statusFilter match {
        case Some(s) => scanned *
          s.count(MetaSource.Statuses.contains).toLong /
          MetaSource.Statuses.length
        case None => scanned
      }
      val capped = limit.fold(filtered)(l => math.min(filtered, l.toLong))
      agg.map(_ => math.min(rows, capped)).getOrElse(capped)
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 96L) // ~row width of the ads record
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def readSchema(): StructType =
    agg.map(_.outputSchema).getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-meta ads scan, PushedStatusFilter=${statusFilter.getOrElse("-")}" +
      s", ReadSchema=${readSchema().fieldNames.mkString(",")}" +
      limit.map(n => s", PushedLimit=$n").getOrElse("") +
      topN.map { case (desc, n) =>
        s", PushedTopN=[_ingest_order ${if (desc) "DESC" else "ASC"}, $n]"
      }.getOrElse("") +
      agg.map(a => s", PushedAggregation=[${a.groupCols.mkString(",")} -> " +
        s"${a.funcs.mkString(",")}]").getOrElse("")

  // topN on the cursor column clamps the scanned range itself
  private val (scanStart, scanEnd) = topN match {
    case Some((false, n)) => (0L, math.min(n.toLong, rows)) // head
    case Some((true, n)) => (math.max(0L, rows - n), rows)  // tail
    case None => (0L, rows)
  }

  override def planInputPartitions(): Array[InputPartition] = agg match {
    // complete aggregate pushdown: the "server" answers with one page of
    // pre-aggregated rows (exactly what /insights does with level/
    // breakdowns params) — a single partition carrying group rows, whose
    // count is bounded by the key-space, not the cursor length
    case Some(_) => Array(MetaAdsPage(0L, rows))
    case None =>
      (scanStart until scanEnd by pageSize.toLong)
        .map(s => MetaAdsPage(s, math.min(s + pageSize, scanEnd)))
        .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MetaReaderFactory(required, statusFilter, limit, agg)

  /** Test/inspection hooks. */
  def pushedStatusFilter: Option[Set[String]] = statusFilter
  def requiredColumns: Seq[String] = required.fieldNames.toSeq
  def pushedLimit: Option[Int] = limit
  def pushedAggregation: Option[String] =
    agg.map(a => s"${a.groupCols.mkString(",")} -> ${a.funcs.mkString(",")}")
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
    statusFilter: Option[Set[String]], limit: Option[Int] = None,
    agg: Option[PushedAggregation] = None) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[MetaAdsPage]
    agg match {
      case Some(a) => aggReader(page, a)
      case None => rowReader(page)
    }
  }

  /** Complete-pushdown reader: the emulated server scans its own store,
    * applies the pushed filter, aggregates per group key, and returns one
    * page of group rows (insertion-ordered for determinism). */
  private def aggReader(page: MetaAdsPage, a: PushedAggregation)
      : PartitionReader[InternalRow] = {
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], Array[Any]]
    var i = page.start
    while (i < page.end) {
      val rec = MetaAdsPage.record(i)
      if (statusFilter.forall(_.contains(
          rec("effective_status").asInstanceOf[String]))) {
        val key = a.groupCols.map(rec)
        val accs = groups.getOrElseUpdate(key,
          a.funcs.map(f => f.kind match {
            case "count" if f.distinct =>
              scala.collection.mutable.HashSet.empty[Any]
            case "count" | "sum" => java.lang.Long.valueOf(0L)
            case _ => null // min/max start empty
          }).toArray[Any])
        a.funcs.zipWithIndex.foreach { case (f, j) =>
          val v = f.col.map(rec).orNull
          // SQL semantics: COUNT(col)/COUNT(DISTINCT col)/SUM/MIN/MAX
          // ignore nulls; only COUNT(*) (f.col empty) counts every row.
          if (v != null || f.col.isEmpty) f.kind match {
            case "count" if f.distinct =>
              accs(j).asInstanceOf[scala.collection.mutable.HashSet[Any]] += v
            case "count" =>
              accs(j) = java.lang.Long.valueOf(
                accs(j).asInstanceOf[java.lang.Long] + 1L)
            case "sum" =>
              accs(j) = java.lang.Long.valueOf(
                accs(j).asInstanceOf[java.lang.Long] + v.asInstanceOf[Long])
            case "min" | "max" =>
              val better = accs(j) == null || ((v, accs(j)) match {
                case (x: String, cur: String) =>
                  // UTF-8 binary order, matching Spark's UTF8String
                  // comparison (not UTF-16 code-unit order).
                  val c = UTF8String.fromString(x)
                    .compareTo(UTF8String.fromString(cur))
                  if (f.kind == "min") c < 0 else c > 0
                case (x: Long, cur: Long) =>
                  if (f.kind == "min") x < cur else x > cur
                case _ => false
              })
              if (better) accs(j) = v
          }
        }
      }
      i += 1
    }
    // a global aggregate (no GROUP BY) over zero matching rows still
    // returns one row: count = 0, sum/min/max = null (ANSI semantics)
    if (a.groupCols.isEmpty && groups.isEmpty)
      groups(Nil) = a.funcs.map(f => f.kind match {
        case "count" if f.distinct =>
          scala.collection.mutable.HashSet.empty[Any]
        case "count" => java.lang.Long.valueOf(0L)
        case _ => null // sum/min/max over empty input
      }).toArray[Any]
    val out = groups.iterator.map { case (key, accs) =>
      val groupVals = key.map {
        case s: String => UTF8String.fromString(s)
        case l: Long => java.lang.Long.valueOf(l)
        case other => other
      }
      val aggVals = a.funcs.zipWithIndex.map { case (f, j) =>
        f.kind match {
          case "count" if f.distinct => java.lang.Long.valueOf(
            accs(j).asInstanceOf[scala.collection.mutable.HashSet[Any]]
              .size.toLong)
          case "count" | "sum" => accs(j)
          case _ => accs(j) match {
            case s: String => UTF8String.fromString(s)
            case other => other
          }
        }
      }
      new GenericInternalRow(
        (groupVals ++ aggVals).toArray[Any]): InternalRow
    }
    val capped = limit.map(out.take).getOrElse(out)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        capped.hasNext && { current = capped.next(); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  private def rowReader(page: MetaAdsPage): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = page.start - 1
      private var emitted = 0
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
        // pushed limit: stop advancing the cursor once this page has
        // yielded enough rows (Spark re-applies the global limit)
        if (limit.exists(emitted >= _)) return false
        var found = false
        while (!found && i + 1 < page.end) {
          i += 1
          val rec = MetaAdsPage.record(i)
          // "server-side" filter: applied before the row leaves the page
          if (statusFilter.forall(_.contains(
              rec("effective_status").asInstanceOf[String]))) {
            current = toRow(rec)
            emitted += 1
            found = true
          }
        }
        found
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

// ---------------------------------------------------------------------------
// /insights endpoint: batch scan + MicroBatchStream (the streaming half of
// the connector story)
// ---------------------------------------------------------------------------

/** The /insights table: `spark.read.format("graft-meta")
  * .option("endpoint", "insights")` for a one-shot pull of the whole
  * `days × ads` range, and `spark.readStream...` for the reference's
  * INCREMENTAL re-pull loop (src/extract.py:34-47: every run re-pulls
  * the trailing window and upserts) restated as a DSv2
  * [[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]]:
  * the OFFSET IS THE TIME WINDOW — day index `d` means "windows
  * [0, d) have been committed" — so each micro-batch is the next
  * uncommitted day-window pull, a checkpoint restart resumes from the
  * committed window (no re-pull, no gap), and raising `days` on a
  * later run streams exactly the newly visible windows through the
  * same checkpoint (the incremental daily-rerun contract,
  * MetaSourceSpec pins it). Pages within a window are
  * `InputPartition`s — executors fetch window pages concurrently, same
  * as the batch ads scan.
  *
  * Like the ads table, the "remote API" is a deterministic generator
  * (pure arithmetic on (day, ad) — no egress in this environment), so
  * every pull is oracle-replayable; swap [[MetaInsightsPage.write]]'s
  * arithmetic for an HTTP fetch of
  * `/insights?time_range={since,until}&time_increment=1` to target the
  * live endpoint. */
class MetaInsightsTable(days: Int, ads: Long, daysPerTrigger: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_meta_insights(days=$days,ads=$ads)"
  override def schema(): StructType = MetaSource.InsightsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan =
      new MetaInsightsScan(days, ads, daysPerTrigger)
  }
}

class MetaInsightsScan(days: Int, ads: Long, daysPerTrigger: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = MetaSource.InsightsSchema
  override def description(): String =
    s"graft-meta insights scan, days=$days, ads=$ads"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until days).map(d =>
      MetaInsightsPage(d, 0L, ads): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new MetaInsightsReaderFactory
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MetaInsightsMicroBatchStream(days, ads, daysPerTrigger)
}

/** Offset = "day windows [0, day) committed". */
case class MetaDayOffset(day: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = day.toString
}

class MetaInsightsMicroBatchStream(days: Int, ads: Long,
    daysPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // Trigger.AvailableNow pins the catch-up target at stream start so
  // the run processes a FIXED range even if the "server" grows
  // mid-run, then stops — the incremental batch-job shape.
  @volatile private var target: Int = days
  override def prepareForTriggerAvailableNow(): Unit = { target = days }

  override def initialOffset(): Offset = MetaDayOffset(0)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(Offset, ReadLimit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // one day-window per trigger (the re-pull granularity); the
    // AvailableNow wrapper keeps triggering until the target is reached
    val s = start.asInstanceOf[MetaDayOffset].day
    MetaDayOffset(math.min(s + daysPerTrigger, target))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = MetaDayOffset(target)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[MetaDayOffset].day
    val e = end.asInstanceOf[MetaDayOffset].day
    (s until e).map(d => MetaInsightsPage(d, 0L, ads): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MetaInsightsReaderFactory
  override def deserializeOffset(json: String): Offset =
    MetaDayOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One day-window page: ads [adStart, adEnd) of day index `day`. */
case class MetaInsightsPage(day: Int, adStart: Long, adEnd: Long)
    extends InputPartition

object MetaInsightsPage {
  private val Epoch = java.time.LocalDate.of(2024, 1, 1)

  /** Deterministic /insights record for (day d, ad a) — string-typed
    * metrics and the actions array, exactly the raw-pull shape. All
    * arithmetic is integer (SQL-replayable); spend is rendered from
    * integer cents so both engines parse the identical decimal
    * string. */
  def write(d: Long, a: Long): InternalRow = {
    val imp = 100 + (a * 7 + d * 13) % 900
    val clk = (a * 3 + d * 5) % 50
    val cents = (a * 11 + d * 17) % 10000
    val lead = (a + d) % 20
    val purchase = (a * 2 + d) % 10
    val fb = (a + 2 * d) % 5
    val entries = Seq("lead" -> lead, "purchase" -> purchase,
        "offsite_conversion.fb_pixel_lead" -> fb)
      .filter(_._2 != 0L)
      .map { case (t, v) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t),
          UTF8String.fromString(v.toString))): Any
      }
    val actions =
      if (entries.isEmpty) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(
        entries.toArray)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(Epoch.plusDays(d).toString),
      UTF8String.fromString(s"ad_$a"),
      UTF8String.fromString(s"as_${a % 7}"),
      UTF8String.fromString(s"c_${a % 3}"),
      UTF8String.fromString(imp.toString),
      UTF8String.fromString(clk.toString),
      UTF8String.fromString(f"${cents / 100}%d.${cents % 100}%02d"),
      actions,
      actions))
  }
}

class MetaInsightsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[MetaInsightsPage]
    new PartitionReader[InternalRow] {
      private var a = page.adStart - 1
      private var current: InternalRow = _
      override def next(): Boolean = {
        a += 1
        if (a >= page.adEnd) false
        else { current = MetaInsightsPage.write(page.day, a); true }
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
