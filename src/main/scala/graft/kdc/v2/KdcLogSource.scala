package graft.kdc.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.Job
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.kdc.{KdcLogRecord, Sessionizer}

/** DataSourceV2 table over raw Heimdal KDC logs — the 100 TB parse
  * posture SURVEY.md §4/§7.3 names: `spark.read.format("kdclog")` (and
  * `readStream`) plans the multi-line session parse AS the scan, with
  *
  *  - **byte-level split alignment**: input partitions come from
  *    [[graft.kdc.KdcSessionInputFormat]]'s splits, so one multi-GB
  *    log file fans out across tasks with zero shuffle (the reference's
  *    read-past-split-end contract, `KDCLogRecordReader.java:162-232`,
  *    incl. the splittable-bzip2 path);
  *  - **predicate pushdown INTO the parse stage**: realm/reqtype/
  *    validity predicates evaluate on the typed session record before
  *    any row is materialized — a realm-scoped query over a multi-realm
  *    log fleet never allocates rows for foreign traffic (`pushFilters`
  *    keeps every translatable filter; only untranslatable residue is
  *    re-evaluated by Spark);
  *  - **column pruning INTO the row materialization**: `pruneColumns`'
  *    required schema drives per-field extraction, so a
  *    (client, ts)-projection query materializes 2 of 15 fields.
  *
  * The session fold itself ([[Sessionizer]]) still parses every owned
  * session — the log bytes must be read to find session boundaries at
  * all — so pushdown buys row-materialization and downstream-operator
  * volume, not I/O; at 100 TB the I/O win comes from the split
  * alignment (no shuffle-by-file) and from pruning entire files by
  * directory layout, which composes with this source unchanged.
  *
  * Streaming: the same table supports `readStream` as file-arrival
  * micro-batches ([[KdcMicroBatchStream]]) — the reference's actual
  * production shape, tailing a growing KDC log directory. Offsets are
  * the set of files already admitted (length-stamped, append-only
  * directory contract — the FileStreamSource assumption);
  * `maxFilesPerTrigger` bounds admission per batch, honored under
  * `Trigger.AvailableNow` via [[SupportsTriggerAvailableNow]] (the
  * engine's generic wrapper would jump straight to the prepared end,
  * collapsing the multi-batch replay this source exists to test).
  */
class KdcLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kdclog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KdcLogTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("kdclog source requires a 'path' option"))
    new KdcLogTable(path, properties.asScala.toMap)
  }
}

object KdcLogTable {
  /** The full session-record schema (field-for-field
    * [[graft.kdc.KdcLogRecord]] — see its scaladoc for the reference
    * citations). */
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[KdcLogRecord].schema

  /** Hadoop conf keys forwarded from reader options into the
    * executor-side Configuration (the lookback windows the aligned
    * readers need, plus the split-size bound tests use). */
  private[v2] val ForwardedKeys = Seq(
    "graft.kdc.lookback.bytes", "graft.kdc.bz2.lookback.bytes",
    "mapreduce.input.fileinputformat.split.maxsize")

  private[v2] def confPairs(options: Map[String, String]): Seq[(String, String)] =
    ForwardedKeys.flatMap(k => options.get(k).map(k -> _)) ++
      // reader option alias: maxSplitBytes -> the Hadoop split bound
      options.get("maxSplitBytes")
        .map("mapreduce.input.fileinputformat.split.maxsize" -> _) ++
      // recursive=true descends nested log layouts (host=…/day=… trees)
      // in the batch path; the streaming lister honors it natively
      options.get("recursive")
        .map("mapreduce.input.fileinputformat.input.dir.recursive" -> _)

  /** The executor-side reader Configuration: the FULL session Hadoop
    * configuration (fs credentials / custom schemes / session-level
    * `graft.kdc.*` lookback dials all apply on executors exactly as
    * they did during driver-side split planning), with the per-read
    * reader options overlaid on top (options win). Broadcast once per
    * scan, the same pattern Spark's own file sources use — building a
    * bare `new Configuration()` from only forwarded option keys would
    * silently drop session settings on the executor side (reads fail
    * on non-default filesystems; a session-conf-enlarged lookback
    * window tears sessions at split boundaries). */
  private[v2] def readerConf(options: Map[String, String])
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration] = {
    val sc = SparkSession.active.sparkContext
    val conf = new Configuration(sc.hadoopConfiguration)
    confPairs(options).foreach { case (k, v) => conf.set(k, v) }
    sc.broadcast(new org.apache.spark.util.SerializableConfiguration(conf))
  }
}

class KdcLogTable(path: String, options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"kdclog(`$path`)"
  override def schema(): StructType = KdcLogTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new KdcScanBuilder(path, options ++ caseInsensitive.asScala)
}

class KdcScanBuilder(path: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = KdcLogTable.schema
  private var pushed: Array[Filter] = Array.empty

  /** Keep every filter [[KdcFilterEval]] can evaluate exactly on the
    * typed session record; only the residue goes back to Spark for
    * post-scan evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) = filters.partition(KdcFilterEval.supports)
    pushed = supported
    unsupported
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KdcScan(path, options, required, pushed)
}

class KdcScan(val path: String, options: Map[String, String],
              val requiredSchema: StructType, val pushedFilters: Array[Filter])
    extends Scan {

  override def readSchema(): StructType = requiredSchema

  override def description(): String =
    s"KdcScan path=$path, ReadSchema: ${requiredSchema.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters: ${pushedFilters.mkString("[", ", ", "]")}"

  override def toBatch: Batch = new KdcBatch(path, options, requiredSchema, pushedFilters)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KdcMicroBatchStream(path, options, requiredSchema, pushedFilters)
}

object KdcBatch {
  /** Split the given input paths with [[graft.kdc.KdcSessionInputFormat]]
    * (byte-aligned, splittability-aware) and wrap as connector
    * partitions. Driver-side. */
  private[v2] def planSplits(paths: Seq[Path],
                             options: Map[String, String]): Array[InputPartition] = {
    val base = SparkSession.active.sparkContext.hadoopConfiguration
    val conf = new Configuration(base)
    KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }
    val job = Job.getInstance(conf)
    FileInputFormat.setInputPaths(job, paths: _*)
    new graft.kdc.KdcSessionInputFormat().getSplits(job).asScala.map {
      case fs: FileSplit =>
        KdcInputPartition(fs.getPath.toString, fs.getStart, fs.getLength,
          Option(fs.getLocations).getOrElse(Array.empty))
      case other =>
        throw new IllegalStateException(s"unexpected split type: $other")
    }.toArray
  }
}

class KdcBatch(path: String, options: Map[String, String],
               requiredSchema: StructType, filters: Array[Filter]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    KdcBatch.planSplits(Seq(new Path(path)), options)
  override def createReaderFactory(): PartitionReaderFactory =
    KdcReaderFactory(KdcLogTable.readerConf(options),
      requiredSchema.fieldNames, filters)
}

/** One byte range of one log file (serializable — shipped to
  * executors). */
case class KdcInputPartition(path: String, start: Long, length: Long,
                             locations: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = locations
}

case class KdcReaderFactory(
    confBc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
    fieldNames: Array[String],
    filters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KdcPartitionReader(partition.asInstanceOf[KdcInputPartition],
      confBc.value.value, fieldNames, filters)
}

/** Executor-side reader: drives the split-aligned session record
  * reader over its byte range, folds each session blob with the shared
  * [[Sessionizer]], applies the pushed predicates on the TYPED record,
  * and materializes only the pruned columns. The Configuration is the
  * broadcast session conf + reader options ([[KdcLogTable.readerConf]])
  * — shared read-only across this executor's tasks. */
class KdcPartitionReader(part: KdcInputPartition,
                         conf: Configuration,
                         fieldNames: Array[String],
                         filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val split = new FileSplit(new Path(part.path), part.start, part.length, null)
  private val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
    conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
  private val reader = {
    val r = new graft.kdc.KdcSessionInputFormat().createRecordReader(split, ctx)
    r.initialize(split, ctx)
    r
  }
  private val extractors: Array[KdcLogRecord => Any] =
    fieldNames.map(KdcFilterEval.extractor)
  private var sessions: Iterator[KdcLogRecord] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (sessions.hasNext) {
        val rec = sessions.next()
        if (KdcFilterEval.matches(filters, rec)) {
          val vals = new Array[Any](extractors.length)
          var i = 0
          while (i < extractors.length) {
            vals(i) = extractors(i)(rec) match {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
            i += 1
          }
          current = new GenericInternalRow(vals)
          return true
        }
      } else if (reader.nextKeyValue()) {
        sessions = Sessionizer.sessionize(
          reader.getCurrentValue.toString.linesIterator)
      } else return false
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Exact evaluation of pushed `sources.Filter`s against a typed
  * [[KdcLogRecord]], with SQL ternary null semantics (a comparison on
  * a null field is UNKNOWN — the row is filtered, and `Not(UNKNOWN)`
  * stays UNKNOWN). Only filters [[supports]] accepts are pushed, so
  * evaluation here is total. String comparisons are lexical — which
  * for the fixed-width ISO `ts` field IS chronological order
  * (`KDCLogRecord.java:249`), making ts range predicates pushable. */
private[v2] object KdcFilterEval {

  private[v2] def extractor(field: String): KdcLogRecord => Any = field match {
    case "valid" => r => r.valid
    case "ts" => r => r.ts
    case "req_type" => r => r.req_type
    case "error_class" => r => r.error_class
    case "client" => r => r.client
    case "crealm" => r => r.crealm
    case "service" => r => r.service
    case "srealm" => r => r.srealm
    case "client_ip" => r => r.client_ip
    case "success" => r => r.success
    case "referral" => r => r.referral
    case "error" => r => r.error
    case "preauth_enctype" => r => r.preauth_enctype
    case "supported_enctypes" => r => r.supported_enctypes
    case "used_enctype" => r => r.used_enctype
    case other => throw new IllegalArgumentException(s"unknown field $other")
  }

  private val fields = KdcLogTable.schema.fieldNames.toSet

  def supports(f: Filter): Boolean = f match {
    case sources.EqualTo(a, v) => fields(a) && v != null
    case sources.In(a, vs) => fields(a) && vs != null && !vs.contains(null)
    case sources.GreaterThan(a, v: String) => fields(a)
    case sources.GreaterThanOrEqual(a, v: String) => fields(a)
    case sources.LessThan(a, v: String) => fields(a)
    case sources.LessThanOrEqual(a, v: String) => fields(a)
    case sources.IsNull(a) => fields(a)
    case sources.IsNotNull(a) => fields(a)
    case sources.StringStartsWith(a, _) => fields(a)
    case sources.StringContains(a, _) => fields(a)
    case sources.Not(child) => supports(child)
    case sources.And(l, r) => supports(l) && supports(r)
    case sources.Or(l, r) => supports(l) && supports(r)
    case _ => false
  }

  def matches(filters: Array[Filter], rec: KdcLogRecord): Boolean =
    filters.forall(f => eval(f, rec) eq java.lang.Boolean.TRUE)

  /** Three-valued evaluation: TRUE / FALSE / null (UNKNOWN). */
  private def eval(f: Filter, rec: KdcLogRecord): java.lang.Boolean = f match {
    case sources.EqualTo(a, v) =>
      val x = extractor(a)(rec)
      if (x == null) null else java.lang.Boolean.valueOf(x == v)
    case sources.In(a, vs) =>
      val x = extractor(a)(rec)
      if (x == null) null else java.lang.Boolean.valueOf(vs.contains(x))
    case sources.GreaterThan(a, v: String) => cmp(a, rec, _ > 0, v)
    case sources.GreaterThanOrEqual(a, v: String) => cmp(a, rec, _ >= 0, v)
    case sources.LessThan(a, v: String) => cmp(a, rec, _ < 0, v)
    case sources.LessThanOrEqual(a, v: String) => cmp(a, rec, _ <= 0, v)
    case sources.IsNull(a) =>
      java.lang.Boolean.valueOf(extractor(a)(rec) == null)
    case sources.IsNotNull(a) =>
      java.lang.Boolean.valueOf(extractor(a)(rec) != null)
    case sources.StringStartsWith(a, prefix) =>
      val x = extractor(a)(rec)
      if (x == null) null
      else java.lang.Boolean.valueOf(x.asInstanceOf[String].startsWith(prefix))
    case sources.StringContains(a, needle) =>
      val x = extractor(a)(rec)
      if (x == null) null
      else java.lang.Boolean.valueOf(x.asInstanceOf[String].contains(needle))
    case sources.Not(child) =>
      val b = eval(child, rec)
      if (b == null) null else java.lang.Boolean.valueOf(!b.booleanValue())
    case sources.And(l, r) =>
      (eval(l, rec), eval(r, rec)) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) =>
          java.lang.Boolean.FALSE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.TRUE
      }
    case sources.Or(l, r) =>
      (eval(l, rec), eval(r, rec)) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) =>
          java.lang.Boolean.TRUE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.FALSE
      }
    case other =>
      throw new IllegalStateException(s"unsupported pushed filter $other")
  }

  private def cmp(a: String, rec: KdcLogRecord, ok: Int => Boolean,
                  v: String): java.lang.Boolean = {
    val x = extractor(a)(rec)
    if (x == null) null
    else java.lang.Boolean.valueOf(ok(x.asInstanceOf[String].compareTo(v)))
  }
}

/** File-set offset for the streaming source: every admitted file with
  * its length at admission time (append-only-directory contract — a
  * file is admitted whole, exactly once). JSON map `path -> length`. */
case class KdcFileOffset(files: Map[String, Long]) extends Offset {
  override def json(): String = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(files)
  }
}

object KdcFileOffset {
  def fromJson(json: String): KdcFileOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    KdcFileOffset(org.json4s.jackson.Serialization.read[Map[String, Long]](json))
  }
}

/** Micro-batch stream over a growing KDC log directory: each batch
  * admits the (lexically ordered) files not yet in the start offset,
  * bounded by `maxFilesPerTrigger` when set, and plans them through
  * the SAME split-aligned partitions, pushed predicates, and pruned
  * schema as the batch scan. Implements [[SupportsTriggerAvailableNow]]
  * so `Trigger.AvailableNow` replays a backlog in multiple bounded
  * batches (the engine's generic wrapper would jump to the prepared
  * end in one batch, defeating the admission bound). */
class KdcMicroBatchStream(path: String, options: Map[String, String],
                          requiredSchema: StructType, filters: Array[Filter])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)

  /** Bound captured by prepareForTriggerAvailableNow: files visible at
    * query start; AvailableNow batches never admit past it. */
  @volatile private var prepared: Option[Map[String, Long]] = None

  /** Snapshot the visible log files: the path may be a file, a
    * directory, or a GLOB; `recursive=true` additionally descends
    * nested layouts (host=…/day=… trees). Hidden ('_'/'.'-prefixed)
    * names are skipped at every level, matching Hadoop input formats. */
  private def listFiles(): Map[String, Long] = {
    val p = new Path(path)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val recursive = options.get("recursive").exists(_.toBoolean)
    def visible(q: Path): Boolean = {
      val n = q.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val out = scala.collection.mutable.Map[String, Long]()
    def walk(st: org.apache.hadoop.fs.FileStatus, depth: Int): Unit =
      if (st.isFile) {
        if (visible(st.getPath)) out(st.getPath.toString) = st.getLen
      } else if (depth == 0 || recursive) {
        fs.listStatus(st.getPath).foreach(c => if (visible(c.getPath)) walk(c, depth + 1))
      }
    Option(fs.globStatus(p)).getOrElse(Array.empty).foreach(walk(_, 0))
    out.toMap
  }

  override def prepareForTriggerAvailableNow(): Unit =
    prepared = Some(listFiles())

  override def initialOffset(): Offset = KdcFileOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val known = start.asInstanceOf[KdcFileOffset].files
    val visible = prepared.getOrElse(listFiles())
    val fresh = visible.view.filterKeys(!known.contains(_)).toSeq.sortBy(_._1)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    KdcFileOffset(known ++ admitted)
  }

  override def reportLatestOffset(): Offset =
    KdcFileOffset(prepared.getOrElse(listFiles()))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KdcFileOffset].files
    val e = end.asInstanceOf[KdcFileOffset].files
    val fresh = e.keySet.diff(s.keySet).toSeq.sorted
    if (fresh.isEmpty) Array.empty
    else KdcBatch.planSplits(fresh.map(new Path(_)), options)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KdcReaderFactory(KdcLogTable.readerConf(options),
      requiredSchema.fieldNames, filters)

  override def deserializeOffset(json: String): Offset = KdcFileOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
