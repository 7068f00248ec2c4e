package graft.kdc.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.lib.input.FileSplit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning => V2Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  * volume, not I/O. The 100 TB I/O win comes from two planner-side
  * mechanisms:
  *
  *  - **partition-path file pruning**: `k=v` directory segments under
  *    the load path (`host=kdc1/day=2015-11-22/…`, the standard log-
  *    fleet rotation layout) are discovered at schema inference as
  *    trailing STRING partition columns; pushed predicates that
  *    reference only those columns are evaluated driver-side during
  *    split planning and non-matching FILES are never opened at all —
  *    a day-scoped query over a year of logs reads 1/365th of the
  *    bytes. Layout contract: all files share one key sequence
  *    (else no partition columns are inferred); a file missing a value
  *    evaluates as NULL and is pruned by any non-null predicate; keys
  *    shadowing record fields are ignored; values are plain strings
  *    (no URL-unescaping, no type inference — lexical comparison,
  *    like `ts`). Predicate-driven pruning applies to BATCH scans:
  *    Spark builds streaming scans without running filter pushdown
  *    (as of 4.1), so scope a tailing query's I/O with the
  *    `scope=k=v[,k=v…]` reader option — scoped-out directories are
  *    never even listed per trigger — or with a path glob
  *    (`host=STAR/day=2015-11-22/STAR`); with `maxFileAge` set,
  *    `maxFileAgeDirKey=day` additionally skips directories wholly
  *    behind the retention horizon BEFORE listing them, keeping the
  *    per-trigger walk proportional to the live window (see
  *    [[KdcMicroBatchStream]]). Partition columns still materialize
  *    on every path.
  *  - **derived split bounds for splittable-compressed inputs**: a
  *    multi-GB .bz2 log sits UNDER the default 128 MiB split bound in
  *    its compressed size while expanding ~10-30× on decode, so the
  *    default plan would decode it in one task. When the input set
  *    contains splittable-compressed files and the caller set no
  *    explicit bound, the planner derives one for that group —
  *    `max(256 KiB, min(128 MiB / 16, largest/defaultParallelism))`,
  *    16 being a conservative text-log expansion factor (the probe
  *    measured ~28×) — so block-parallel decode (measured 7.3×)
  *    happens by default; uncompressed files keep their own sizing.
  *
  * Streaming: the same table supports `readStream` as file-arrival
  * micro-batches ([[KdcMicroBatchStream]]) — the reference's actual
  * production shape, tailing a growing KDC log directory
  * (append-only-directory contract — a file is admitted whole, exactly
  * once; the FileStreamSource assumption). Offsets are O(1) batch ids
  * backed by a checkpointed per-batch file manifest, so offset size is
  * independent of how many files the fleet has ever produced;
  * `maxFilesPerTrigger` bounds admission per batch, honored under
  * `Trigger.AvailableNow` via [[SupportsTriggerAvailableNow]] (the
  * engine's generic wrapper would jump straight to the prepared end,
  * collapsing the multi-batch replay this source exists to test).
  */
class KdcLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kdclog"

  /** The listing schema inference walked, kept for [[getTable]] so a
    * batch read plans its splits from the SAME snapshot instead of
    * walking the fleet a second time (the r11 verdict's two-walks-per-
    * query cost — at a ~1 ms/RPC namenode the duplicate walk dominates
    * planning). Spark calls inferSchema and getTable back-to-back on
    * one provider instance per `load()`; [[getTable]] CONSUMES the
    * slot (get-and-clear), so the snapshot's lifetime is exactly one
    * inferSchema→getTable handshake — the DSv2 contract does not
    * forbid reusing a provider instance, and a second `load()` through
    * a reused one must re-list rather than silently plan from the
    * first load's stale file set. A single slot also means two
    * CONCURRENT `load()`s may drop each other's snapshot — at worst a
    * second walk, never a wrong listing (the path/recursive guard in
    * [[getTable]] holds either way). The semantic matches Spark's own
    * file sources (file list frozen at load — files arriving between
    * `load()` and an action are not seen by that DataFrame). */
  private val inferredListing = new java.util.concurrent.atomic.AtomicReference[
    Option[(String, Boolean, Seq[KdcFileLayout.KdcFileMeta])]](None)

  /** Base record schema + any `k=v` partition columns discovered from
    * the directory layout under the load path. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = options.asScala.toMap
    opts.get("path").map { p =>
      val recursive = opts.get("recursive").exists(_.toBoolean)
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val listing = KdcFileLayout.listFilesDetailed(p, recursive, conf, strict = false)
      // snapshot only listings split planning could reuse VERBATIM: a
      // lenient walk that skipped nested dirs (or matched nothing)
      // must fall through to the strict planning walk so the batch
      // read still fails loudly
      inferredListing.set(
        if (listing.files.nonEmpty && !listing.nestedSkipped)
          Some((p, recursive, listing.files))
        else None)
      KdcLogTable.schemaForFiles(p, listing.files.map(_.path), conf)
    }.getOrElse(KdcLogTable.schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("kdclog source requires a 'path' option"))
    val recursive = Option(properties.get("recursive")).exists(_.toBoolean)
    val snapshot = inferredListing.getAndSet(None).collect {
      case (p, r, files) if p == path && r == recursive => files
    }
    new KdcLogTable(path, properties.asScala.toMap, schema, snapshot)
  }
}

object KdcLogTable {
  /** The base session-record schema (field-for-field
    * [[graft.kdc.KdcLogRecord]] — see its scaladoc for the reference
    * citations), before any layout-discovered partition columns. */
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[KdcLogRecord].schema

  private[v2] val baseFieldNames: Set[String] = schema.fieldNames.toSet

  /** Table schema for an already-listed load path: the base record
    * schema plus one trailing nullable STRING column per `k=v`
    * partition key the directory layout exposes consistently across
    * all listed files. (The caller owns the listing — schema inference
    * shares one walk with split planning.) */
  private[v2] def schemaForFiles(path: String, files: Seq[Path],
                                 conf: Configuration): StructType = {
    val keys = KdcFileLayout.partitionKeys(path, files, conf)
    keys.foldLeft(schema)((s, k) =>
      s.add(org.apache.spark.sql.types.StructField(
        k, org.apache.spark.sql.types.StringType, nullable = true)))
  }

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

/** File listing + `k=v` partition-layout discovery, shared by schema
  * inference, the batch split planner, and the streaming lister (one
  * visibility rule everywhere: '_'/'.'-prefixed names are hidden at
  * every level, matching Hadoop input formats). */
private[graft] object KdcFileLayout {

  /** Directories per level above which the walk lists concurrently —
    * each `listStatus` is one namenode RPC, so a 10k-dir fleet level
    * pays 10k round trips serially but ~10k/16 wall-clock in parallel.
    * Small layouts stay on the serial path (no pool setup cost). */
  private val ParallelListThreshold = 4
  /** Overridable for probes/diagnostics; <=1 forces the serial walk. */
  private def listPoolSize: Int =
    sys.props.get("graft.kdc.list.threads").map(_.toInt).getOrElse(16)

  /** Lightweight file metadata the planner needs — built from ONLY the
    * eager FileStatus getters. (Copying a RawLocalFileSystem status
    * into e.g. LocatedFileStatus forces its LAZY permission fields,
    * which fork an `ls -ld` process PER FILE — measured ~7 ms/file,
    * 70 s over a 10k-file tree.) */
  final case class KdcFileMeta(path: Path, len: Long, blockSize: Long,
                               modTime: Long,
                               blocks: Array[org.apache.hadoop.fs.BlockLocation])

  /** A walk's result: the visible files, plus whether any nested
    * directory was silently skipped (lenient non-recursive mode only —
    * such a listing must NOT be reused where the strict planning walk
    * would have failed loudly). */
  final case class Listing(files: Seq[KdcFileMeta], nestedSkipped: Boolean)

  /** Diagnostic: top-level listing walks performed by this JVM — the
    * probe/spec hook that pins "one walk per planning cycle" (each
    * walk is O(dirs) namenode RPCs; the count, not the local wall, is
    * what transfers to a real namenode). */
  val listingWalks = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Diagnostic: directories actually listed (one namenode listStatus
    * RPC each) across all walks — the number `dirFilter`-pruned tails
    * keep proportional to the live window rather than the fleet's full
    * history (the spec/probe hook for scope/horizon directory
    * pruning). */
  val dirsListed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Parse a `k=v[,k=v…]` scope string (the CLI's `--scope` and the
    * reader/stream `scope` option) into partition-path equality pairs.
    * Values are RAW path-segment strings, compared byte-for-byte
    * against the `k=v` directory segments the layout walker discovers
    * — NO URL-decoding or unescaping happens on either side (the
    * walker takes segments verbatim, so a layout writer that
    * percent-encodes values must scope with the encoded form).
    * Consequently a partition value containing a comma — the pair
    * separator — cannot be expressed here at all; scope such layouts
    * with a path glob instead. */
  private[graft] def parseScope(s: String): Map[String, String] =
    s.split(',').toSeq.map { pair =>
      val eq = pair.indexOf('=')
      require(eq > 0 && eq < pair.length - 1,
        s"scope expects k=v[,k=v…], got segment '$pair'")
      pair.substring(0, eq) -> pair.substring(eq + 1)
    }.toMap

  /** Snapshot the files under `path` (a file, a directory, or a glob);
    * `recursive` additionally descends nested layouts. Driver-side,
    * breadth-first; levels with many directories list in parallel on a
    * bounded pool (the FileSystem client is thread-safe; this is the
    * driver-local analog of Spark's parallel partition discovery).
    * On distributed filesystems the listing uses `listLocatedStatus`,
    * so each status already carries its BLOCK LOCATIONS and split
    * planning never goes back to the namenode per file (the per-file
    * re-listing FileInputFormat would do is the other O(files) serial
    * RPC stage at fleet scale); on the local filesystem — whose
    * location machinery is per-file-exec slow and whose synthesized
    * localhost locations carry no information — the walk lists plainly
    * and reports no preferred locations. `strict` throws when the
    * path/glob matches nothing at all (the batch-read contract); the
    * streaming lister passes false — a tailed directory may not exist
    * yet. `dirFilter` is consulted BEFORE a directory is listed (glob
    * roots included): a false verdict prunes the whole subtree without
    * a single RPC into it — the scope/retention-horizon hook the
    * streaming tail uses to keep the per-trigger walk proportional to
    * the live window. */
  def listFiles(path: String, recursive: Boolean, conf: Configuration,
                strict: Boolean,
                dirFilter: Path => Boolean = _ => true): Seq[KdcFileMeta] =
    listFilesDetailed(path, recursive, conf, strict, dirFilter).files

  def listFilesDetailed(path: String, recursive: Boolean, conf: Configuration,
                        strict: Boolean,
                        dirFilter: Path => Boolean = _ => true): Listing = {
    import org.apache.hadoop.fs.{FileStatus, LocatedFileStatus}
    listingWalks.incrementAndGet()
    var nestedSkipped = false
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val localFs = fs.getScheme == "file"
    def visible(q: Path): Boolean = {
      val n = q.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val roots = Option(fs.globStatus(p)).getOrElse(Array.empty)
    if (roots.isEmpty && strict)
      throw new java.io.FileNotFoundException(s"kdclog: no input found at $path")

    def meta(st: FileStatus): KdcFileMeta = {
      val blocks = st match {
        case l: LocatedFileStatus => l.getBlockLocations
        case other if !localFs && other.isFile =>
          fs.getFileBlockLocations(other, 0, other.getLen)
        case _ => Array.empty[org.apache.hadoop.fs.BlockLocation]
      }
      KdcFileMeta(st.getPath, st.getLen, st.getBlockSize,
        st.getModificationTime, blocks)
    }
    def listDir(d: Path): Seq[FileStatus] = {
      dirsListed.incrementAndGet()
      if (localFs) fs.listStatus(d).toSeq
      else {
        val it = fs.listLocatedStatus(d)
        val buf = scala.collection.mutable.ArrayBuffer[FileStatus]()
        while (it.hasNext) buf += it.next()
        buf.toSeq
      }
    }

    val out = scala.collection.mutable.ArrayBuffer[KdcFileMeta]()
    var frontier = scala.collection.mutable.ArrayBuffer[Path]()
    roots.foreach { st =>
      if (st.isFile) { if (visible(st.getPath)) out += meta(st) }
      else if (dirFilter(st.getPath)) frontier += st.getPath
    }
    var depth = 0
    while (frontier.nonEmpty) {
      if (depth > 0 && !recursive) {
        if (strict)
          // a nested dir under a non-recursive batch read would be
          // SILENTLY skipped — fail like FileInputFormat does instead
          throw new java.io.IOException(
            s"kdclog: not a file: ${frontier.head} (nested layout — set recursive=true or use a glob)")
        nestedSkipped = true
        frontier.clear()
      } else {
        val level: Seq[Seq[FileStatus]] =
          if (frontier.length < ParallelListThreshold || listPoolSize <= 1)
            frontier.toSeq.map(listDir)
          else {
            val pool = java.util.concurrent.Executors.newFixedThreadPool(
              math.min(listPoolSize, frontier.length))
            try {
              import scala.jdk.CollectionConverters._
              val tasks = frontier.toSeq.map { d =>
                new java.util.concurrent.Callable[Seq[FileStatus]] {
                  override def call() = listDir(d)
                }
              }
              pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
            } finally pool.shutdown()
          }
        val next = scala.collection.mutable.ArrayBuffer[Path]()
        level.iterator.flatten.foreach { c =>
          if (visible(c.getPath)) {
            if (c.isFile) out += meta(c)
            else if (dirFilter(c.getPath)) next += c.getPath
          }
        }
        frontier = next
      }
      depth += 1
    }
    Listing(out.toSeq, nestedSkipped)
  }

  private val GlobChars: Set[Char] = Set('*', '?', '[', ']', '{', '}', '\\')

  /** The longest non-glob prefix of the load path — partition segments
    * are the `k=v` directories strictly between this base and each
    * file. (Globbed segments still yield partition values: for a glob
    * like `fleet/host=STAR/day=STAR/kdc.log` the base is `fleet`.) */
  private def rawBase(path: String): String = {
    val segs = path.split('/')
    val i = segs.indexWhere(_.exists(GlobChars))
    if (i < 0) path else segs.take(i).mkString("/")
  }

  /** URI path of the qualified base, for prefix comparison against
    * listed (always fully-qualified) file paths. */
  private def qualifiedBase(path: String, conf: Configuration): String = {
    val b = new Path(rawBase(path))
    b.getFileSystem(conf).makeQualified(b).toUri.getPath
  }

  /** `k=v` segments of `file`'s directories below the base, in path
    * order. Keys shadowing base record fields are ignored (a dir named
    * `client=x` cannot silently override the parsed field). */
  private def segsBelow(base: String, file: Path): Seq[(String, String)] = {
    val f = file.toUri.getPath
    if (!f.startsWith(base)) return Seq.empty
    f.drop(base.length).split('/').filter(_.nonEmpty).dropRight(1).toSeq.flatMap { seg =>
      val eq = seg.indexOf('=')
      if (eq <= 0) None
      else {
        val k = seg.substring(0, eq)
        if (KdcLogTable.baseFieldNames(k)) None else Some(k -> seg.substring(eq + 1))
      }
    }
  }

  /** Partition keys exposed CONSISTENTLY by every listed file (same
    * key sequence), else none — a mixed layout never produces
    * half-defined partition columns. */
  def partitionKeys(path: String, files: Seq[Path], conf: Configuration): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val base = qualifiedBase(path, conf)
    val keySeqs = files.map(f => segsBelow(base, f).map(_._1))
    if (keySeqs.head.nonEmpty && keySeqs.forall(_ == keySeqs.head)) keySeqs.head
    else Seq.empty
  }

  /** Each file's values for the table's partition keys; a key a path
    * does not carry is absent from its map (resolving to null — pruned
    * by any non-null predicate). The qualified base is computed ONCE
    * for the whole batch, not per file (it depends only on the table
    * path and conf; per-file recomputation was O(files) redundant
    * FileSystem lookups on the planning hot path). */
  def partValuesAll(path: String, files: Seq[Path], partKeys: Seq[String],
                    conf: Configuration): Map[Path, Map[String, String]] = {
    if (partKeys.isEmpty) return files.iterator.map(_ -> Map.empty[String, String]).toMap
    val base = qualifiedBase(path, conf)
    files.iterator.map { f =>
      val found = segsBelow(base, f).toMap
      f -> partKeys.flatMap(k => found.get(k).map(k -> _)).toMap
    }.toMap
  }
}

class KdcLogTable(path: String, options: Map[String, String],
                  tableSchema: StructType,
                  listingSnapshot: Option[Seq[KdcFileLayout.KdcFileMeta]] = None)
    extends Table with SupportsRead {
  override def name(): String = s"kdclog(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new KdcScanBuilder(path, options ++ caseInsensitive.asScala, tableSchema,
      listingSnapshot)
}

class KdcScanBuilder(path: String, options: Map[String, String],
                     tableSchema: StructType,
                     listingSnapshot: Option[Seq[KdcFileLayout.KdcFileMeta]] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var topN: Option[KdcTopN] = None
  private val fields = tableSchema.fieldNames.toSet

  /** Keep every filter [[KdcFilterEval]] can evaluate exactly on the
    * typed session record (or on this table's partition columns); only
    * the residue goes back to Spark for post-scan evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) = filters.partition(KdcFilterEval.supports(fields, _))
    pushed = supported
    unsupported
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown (`SupportsPushDownLimit`), always PARTIAL: each
    * split's reader stops after emitting `limit` post-filter sessions
    * instead of parsing its whole byte range, and Spark keeps the
    * global limit on top. Combined with `CollectLimitExec`'s
    * incremental partition evaluation, a `LIMIT 10` exploration query
    * over a 100 TB fleet opens one split and parses ~10 sessions —
    * without this the first split parsed its full (up to 128 MB
    * decoded) range before the limit applied. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  /** Top-N pushdown (`SupportsPushDownTopN`), always PARTIAL: each
    * split's reader returns only its n best sessions by `ts`, so an
    * `ORDER BY ts [DESC] LIMIT n` exploration query ("the latest n
    * authentications in the fleet") ships n rows per split to the
    * driver's TakeOrdered merge instead of every parsed session.
    * ONLY `ts` qualifies: it is the one record field with a total
    * order the reader can maintain (lexical ISO = chronological).
    * The reader still parses its whole byte range into a BOUNDED
    * n-row heap rather than stopping early — a session's ts is
    * OVERWRITTEN by timestamped error detail lines (the reference's
    * AP-REQ subtlety), so file order is not ts order and an
    * early-stop would drop true minima. `n` is capped so a mis-sized
    * LIMIT cannot turn the heap into an executor-memory hazard. */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    if (orders.length != 1 || l > KdcScanBuilder.MaxPushedTopN) return false
    val o = orders(0)
    val onTs = o.expression() match {
      case nr: NamedReference => nr.fieldNames().sameElements(Array("ts"))
      case _ => false
    }
    if (!onTs) return false
    topN = Some(KdcTopN(
      asc = o.direction() == SortDirection.ASCENDING,
      nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST,
      n = l))
    true
  }

  override def build(): Scan =
    new KdcScan(path, options, tableSchema, required, pushed, listingSnapshot,
      limit, topN)
}

object KdcScanBuilder {
  /** Upper bound on a pushed top-N's per-reader heap; Spark itself
    * only plans TakeOrdered for small limits, so refusing beyond this
    * just declines the pushdown (the query still runs, unpushed). */
  val MaxPushedTopN = 100000
}

/** A pushed `ORDER BY ts LIMIT n` (see [[KdcScanBuilder.pushTopN]]);
  * serializable — shipped to every reader. */
case class KdcTopN(asc: Boolean, nullsFirst: Boolean, n: Int)

object KdcScan {
  /** Raw-log bytes per parsed session, from the parse-cost probe
    * (PLAN_NOTES round 12: 2M sessions in 565 MiB of synthetic KDC log
    * ≈ 296 bytes/session) — the row-count constant behind
    * [[KdcScan.estimateStatistics]]. An estimate, not a promise:
    * Catalyst only needs the right order of magnitude to pick a
    * broadcast over a sort-merge join pre-AQE. */
  private[v2] val EstBytesPerSession = 296L
}

class KdcScan(val path: String, options: Map[String, String],
              tableSchema: StructType,
              val requiredSchema: StructType, val pushedFilters: Array[Filter],
              listingSnapshot: Option[Seq[KdcFileLayout.KdcFileMeta]] = None,
              val pushedLimit: Option[Int] = None,
              val pushedTopN: Option[KdcTopN] = None)
    extends Scan with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning {

  /** Layout-discovered partition columns = table schema minus the base
    * record fields (order preserved). */
  private[v2] val partKeys: Seq[String] =
    tableSchema.fieldNames.toSeq.filterNot(KdcLogTable.baseFieldNames)

  private val recursive = options.get("recursive").exists(_.toBoolean)

  /** The `scope` reader option (`k=v[,k=v…]`) as partition-only
    * equality filters — the option-typed twin of a pushed partition
    * predicate, and the ONLY whole-file pruning channel for STREAMING
    * reads (Spark builds streaming scans without running filter
    * pushdown). Unknown keys fail HERE, at planning, not silently at
    * admission; `maxFileAgeDirKey` (consumed by the stream) is
    * validated alongside for the same loud-at-planning posture. */
  private[v2] val scopeFilters: Array[Filter] = {
    def known(k: String, what: String): Unit =
      require(partKeys.contains(k),
        s"kdclog: $what key '$k' is not a layout partition column " +
          s"(this layout exposes: ${if (partKeys.isEmpty) "none" else partKeys.mkString(", ")})")
    options.get("maxFileAgeDirKey").foreach { k =>
      require(options.contains("maxFileAge"),
        "kdclog: maxFileAgeDirKey requires maxFileAge (it prunes directories behind the retention horizon)")
      known(k, "maxFileAgeDirKey")
    }
    val m = options.get("scope").map(KdcFileLayout.parseScope).getOrElse(Map.empty)
    m.keys.foreach(known(_, "scope"))
    m.map { case (k, v) => sources.EqualTo(k, v): Filter }.toArray
  }

  /** Runtime (DPP) filters, delivered mid-execution via
    * [[SupportsRuntimeFiltering.filter]] — see [[filterAttributes]]. */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  private def effectiveFilters: Array[Filter] =
    pushedFilters ++ scopeFilters ++ runtimeFilters

  /** Dynamic partition pruning for parsed logs
    * (`SupportsRuntimeFiltering`): only the layout's partition-path
    * columns are advertised, so every runtime predicate Spark hands
    * over prunes at WHOLE-FILE granularity — exact, not advisory
    * (each file carries a single value per partition key). The payoff
    * at fleet scale: `parse ⋈ σ(dim)` on a `day=` column opens only
    * the days the filtered dimension actually contains, decided at
    * runtime from the dimension's broadcast result — a static plan
    * cannot know them, and without this the parse side reads the
    * whole fleet. After [[filter]], Spark re-invokes
    * `toBatch.planInputPartitions()` (per `BatchScanExec`), which
    * re-plans splits under `effectiveFilters` and skips pruned files
    * before any is opened. */
  override def filterAttributes(): Array[NamedReference] =
    // only keys surviving column pruning: Spark resolves these against
    // the scan's OUTPUT, and a runtime filter can only ever arrive on
    // a join key the query reads anyway
    partKeys.filter(requiredSchema.fieldNames.contains)
      .map(k => Expressions.column(k)).toArray

  override def filter(filters: Array[Filter]): Unit = {
    // keep only predicates this source can evaluate exactly against
    // partition-path values; anything else is dropped (the join still
    // applies full semantics — runtime pruning is a strict subset)
    runtimeFilters = filters.filter(f =>
      f.references.nonEmpty && f.references.forall(partKeys.contains) &&
        KdcFilterEval.supports(partKeys.toSet, f))
  }

  /** Storage-partitioned-join surface (`SupportsReportPartitioning`),
    * OPT-IN via the `reportPartitioning` reader option: the scan
    * reports `KeyGroupedPartitioning` over the layout's partition
    * columns and every split carries its key ([[HasPartitionKey]]),
    * so with `spark.sql.sources.v2.bucketing.enabled=true` a join or
    * aggregation clustered on those columns plans with NO shuffle on
    * the parse side — two day-partitioned fleets join day-to-day with
    * zero exchange. The trade (why it is opt-in): Spark coalesces all
    * splits of one key tuple into ONE task, so intra-day split
    * parallelism is given up for the exchange-free plan; right when
    * the day count dwarfs the cluster, wrong for a single hot day.
    * Requires a consistent `k=v` layout (partition columns are only
    * inferred when consistent, so every planned file carries values). */
  override def outputPartitioning(): V2Partitioning =
    if (reportPartitioning && partKeys.nonEmpty) plannerListing match {
      case Some(files) =>
        val conf = new Configuration(SparkSession.active.sparkContext.hadoopConfiguration)
        KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }
        val values = KdcFileLayout.partValuesAll(path, files.map(_.path), partKeys, conf)
        val partOnly = effectiveFilters.filter(f =>
          f.references.nonEmpty && f.references.forall(partKeys.contains))
        val kept = files.filter(st =>
          KdcFilterEval.matchesPartition(partOnly.toSeq, values(st.path)))
        val groups = kept.map(st => partKeys.map(values(st.path).getOrElse(_, null))).distinct.size
        new KeyGroupedPartitioning(
          partKeys.map(k => Expressions.identity(k)).toArray, math.max(groups, 1))
      case None => new UnknownPartitioning(0)
    }
    else new UnknownPartitioning(0)

  private def reportPartitioning: Boolean =
    options.get("reportPartitioning").exists(_.toBoolean)

  /** Listing backing [[estimateStatistics]]: schema inference's
    * snapshot when the provider handed one over, else ONE lenient walk
    * — shared with [[toBatch]], so consulting statistics never adds a
    * walk to the planning cycle (and a stats-first optimizer pass
    * leaves split planning with the same one-walk bound). A listing
    * the strict batch planner could not reuse verbatim (empty match,
    * nested dirs under a non-recursive read) stays None: stats fall
    * back to unknown and planning re-walks strictly so it still fails
    * loudly — those disqualified cases pay a second walk, but both
    * END in the strict walk's exception (empty → FileNotFound, nested
    * non-recursive → IOException), so the extra walk is confined to
    * queries that error out anyway. */
  private lazy val plannerListing: Option[Seq[KdcFileLayout.KdcFileMeta]] =
    listingSnapshot.orElse {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val l = KdcFileLayout.listFilesDetailed(path, recursive, conf, strict = false)
      if (l.files.nonEmpty && !l.nestedSkipped) Some(l.files) else None
    }

  /** Post-pruning scan statistics (`SupportsReportStatistics`):
    * without this, Catalyst sizes a parsed-log join side at
    * `defaultSizeInBytes` pre-AQE, so a day-scoped parse that prunes
    * to one file could not be broadcast against a dimension table
    * until AQE replans post-shuffle. The estimate prices exactly what
    * the planner will read: files surviving partition-path pruning
    * (pushed predicates + the `scope` option), their bytes expanded by
    * the compressed-log factor where a codec applies, rows from the
    * parse-cost probe's bytes-per-session constant, and bytes scaled
    * to the PRUNED column set (a 2-of-15-column projection is priced
    * at its materialized width, not the log's). Data-field predicates
    * are NOT priced in (no selectivity model — same convention as
    * Spark's file sources), so the estimate errs conservative. */
  override def estimateStatistics(): Statistics = plannerListing match {
    case None =>
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }
    case Some(files) =>
      val conf = new Configuration(SparkSession.active.sparkContext.hadoopConfiguration)
      KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }
      val partOnly = effectiveFilters.filter(f =>
        f.references.nonEmpty && f.references.forall(partKeys.contains))
      val values = KdcFileLayout.partValuesAll(path, files.map(_.path), partKeys, conf)
      val kept = files.filter(st =>
        KdcFilterEval.matchesPartition(partOnly.toSeq, values(st.path)))
      val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      val rawBytes = kept.iterator.map { st =>
        if (codecs.getCodec(st.path) != null)
          st.len * KdcBatch.CompressedExpansionFactor
        else st.len
      }.sum
      val rows =
        if (rawBytes == 0L) 0L
        else math.max(1L, rawBytes / KdcScan.EstBytesPerSession)
      val width = math.max(1, requiredSchema.defaultSize)
      val bytes = if (rows == 0L) 0L else math.max(1L, rows * width)
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      }
  }

  override def readSchema(): StructType = requiredSchema

  override def description(): String =
    s"KdcScan path=$path, ReadSchema: ${requiredSchema.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters: ${effectiveFilters.mkString("[", ", ", "]")}"

  override def toBatch: Batch =
    new KdcBatch(path, options, partKeys, requiredSchema, effectiveFilters,
      plannerListing, pushedLimit, pushedTopN)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KdcMicroBatchStream(path, options, partKeys, requiredSchema, effectiveFilters,
      checkpointLocation)
}

object KdcBatch {
  /** Conservative decode-expansion factor for splittable-compressed
    * text logs (the scale probe measured ~28× on a synthetic KDC log;
    * 16 keeps derived splits within ~2× of the uncompressed target
    * even on less-compressible corpora). */
  private[v2] val CompressedExpansionFactor = 16L
  /** Uncompressed per-task volume target — Spark's default
    * `spark.sql.files.maxPartitionBytes` spirit. */
  private[v2] val TargetUncompressedSplitBytes = 128L << 20
  /** Floor: roughly one compressed bzip2 block plus probe slack; finer
    * splits only add per-task probe overhead. */
  private[v2] val MinCompressedSplitBytes = 256L << 10

  /** Derived split bound for a group of splittable-compressed files
    * when the caller set none: small enough that decode parallelism
    * survives the expansion factor, large enough to use the cluster on
    * the largest single file, never below one block. */
  private[kdc] def defaultCompressedSplitBytes(largest: Long, parallelism: Int): Long =
    math.max(MinCompressedSplitBytes,
      math.min(TargetUncompressedSplitBytes / CompressedExpansionFactor,
        math.max(1L, largest / math.max(1, parallelism))))

  /** FileInputFormat's split-slop: the final chunk may run up to 10%
    * over the split size rather than spawn a sliver task. */
  private val SplitSlop = 1.1

  /** Plan the connector partitions for `inputPaths` (driver-side):
    * list (block locations ride along — no per-file namenode
    * round-trips), prune whole files via partition-path predicates,
    * then chunk byte ranges exactly as FileInputFormat would —
    * splittable files (uncompressed or splittable-codec) at
    * `max(minSize, min(maxSize, blockSize))` with the 1.1 slop,
    * non-splittable codecs whole-file; splittable-COMPRESSED files get
    * a derived maxSize (see [[defaultCompressedSplitBytes]]) unless
    * the caller set an explicit bound. `tablePath` anchors
    * partition-segment extraction (it may differ from `inputPaths` in
    * the streaming case, where fresh files are planned individually). */
  private[v2] def planSplits(inputPaths: Seq[Path], options: Map[String, String],
                             tablePath: String, partKeys: Seq[String],
                             filters: Array[Filter]): Array[InputPartition] = {
    val conf = new Configuration(SparkSession.active.sparkContext.hadoopConfiguration)
    KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }
    val recursive = options.get("recursive").exists(_.toBoolean)
    val files = inputPaths.flatMap(p =>
      KdcFileLayout.listFiles(p.toString, recursive, conf, strict = true))
    splitsForListed(files, options, tablePath, partKeys, filters)
  }

  /** [[planSplits]] minus the walk — for callers that already hold the
    * listing (schema inference's snapshot in the batch path; the
    * trigger's listing in the streaming path). */
  private[v2] def splitsForListed(files: Seq[KdcFileLayout.KdcFileMeta],
                                  options: Map[String, String],
                                  tablePath: String, partKeys: Seq[String],
                                  filters: Array[Filter]): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }

    // whole-file pruning: a predicate over partition columns only holds
    // the same verdict for every row of a file, so UNKNOWN/FALSE files
    // are skipped without being opened
    val partOnly = filters.filter(f =>
      f.references.nonEmpty && f.references.forall(partKeys.contains))
    val values: Map[Path, Map[String, String]] =
      KdcFileLayout.partValuesAll(tablePath, files.map(_.path), partKeys, conf)
    val kept = files.filter(st =>
      KdcFilterEval.matchesPartition(partOnly, values(st.path)))

    val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    def codecOf(p: Path) = Option(codecs.getCodec(p))
    def isSplittableCompressed(p: Path): Boolean = codecOf(p)
      .exists(_.isInstanceOf[org.apache.hadoop.io.compress.SplittableCompressionCodec])

    val minSize = conf.getLong("mapreduce.input.fileinputformat.split.minsize", 1L)
    val explicitMax = Option(conf.get("mapreduce.input.fileinputformat.split.maxsize"))
      .map(_.toLong)
    val compressedSplittable = kept.filter(st => isSplittableCompressed(st.path))
    val derivedCompressedMax =
      if (compressedSplittable.isEmpty) None
      else Some(defaultCompressedSplitBytes(compressedSplittable.map(_.len).max,
        spark.sparkContext.defaultParallelism))

    val keyOrder = partKeys.toArray
    kept.flatMap { st =>
      val path = st.path
      val len = st.len
      def hosts(offset: Long): Array[String] = {
        val blocks = st.blocks
        if (blocks == null || blocks.isEmpty) Array.empty[String]
        else {
          val i = blocks.indexWhere(b =>
            offset >= b.getOffset && offset < b.getOffset + b.getLength)
          // an offset no block covers gets NO locality hint — block 0's
          // hosts would be a wrong hint, strictly worse than none
          if (i < 0) Array.empty[String]
          else Option(blocks(i).getHosts).getOrElse(Array.empty[String])
        }
      }
      val splittable = codecOf(path).forall(
        _.isInstanceOf[org.apache.hadoop.io.compress.SplittableCompressionCodec])
      if (len == 0 || !splittable)
        Seq(KdcInputPartition(path.toString, 0, len, hosts(0), values(path), keyOrder))
      else {
        val maxSize = explicitMax.orElse(
          if (isSplittableCompressed(path)) derivedCompressedMax else None)
          .getOrElse(Long.MaxValue)
        val splitSize = math.max(minSize, math.min(maxSize, st.blockSize))
        val out = scala.collection.mutable.ArrayBuffer[KdcInputPartition]()
        var remaining = len
        while (remaining.toDouble / splitSize > SplitSlop) {
          val start = len - remaining
          out += KdcInputPartition(path.toString, start, splitSize, hosts(start), values(path), keyOrder)
          remaining -= splitSize
        }
        if (remaining != 0) {
          val start = len - remaining
          out += KdcInputPartition(path.toString, start, remaining, hosts(start), values(path), keyOrder)
        }
        out.toSeq
      }
    }.toArray
  }
}

class KdcBatch(path: String, options: Map[String, String], partKeys: Seq[String],
               requiredSchema: StructType, filters: Array[Filter],
               listingSnapshot: Option[Seq[KdcFileLayout.KdcFileMeta]] = None,
               limit: Option[Int] = None,
               topN: Option[KdcTopN] = None)
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    listingSnapshot match {
      // schema inference already walked the fleet — plan from its
      // snapshot (one walk per query; snapshot-at-load semantics)
      case Some(files) =>
        KdcBatch.splitsForListed(files, options, path, partKeys, filters)
      case None =>
        KdcBatch.planSplits(Seq(new Path(path)), options, path, partKeys, filters)
    }
  override def createReaderFactory(): PartitionReaderFactory =
    KdcReaderFactory(KdcLogTable.readerConf(options), requiredSchema.fieldNames,
      // partition-only predicates are fully applied at planning (file
      // granularity is exact for them); readers evaluate the rest
      filters.filterNot(f =>
        f.references.nonEmpty && f.references.forall(partKeys.contains)),
      limit, topN)
}

/** One byte range of one log file (serializable — shipped to
  * executors), carrying the file's partition-column values.
  * `keyOrder` is the layout's partition-column order; it backs
  * [[HasPartitionKey]] so splits can be key-grouped when the scan
  * reports [[KeyGroupedPartitioning]] (opt-in — see
  * [[KdcScan.outputPartitioning]]); Spark never consults
  * `partitionKey()` otherwise. */
case class KdcInputPartition(path: String, start: Long, length: Long,
                             locations: Array[String],
                             partValues: Map[String, String],
                             keyOrder: Array[String] = Array.empty)
    extends InputPartition with HasPartitionKey {
  override def preferredLocations(): Array[String] = locations
  override def partitionKey(): InternalRow =
    new GenericInternalRow(keyOrder.map(k =>
      partValues.get(k).map(UTF8String.fromString).orNull: Any))
}

case class KdcReaderFactory(
    confBc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
    fieldNames: Array[String],
    filters: Array[Filter],
    limit: Option[Int] = None,
    topN: Option[KdcTopN] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KdcPartitionReader(partition.asInstanceOf[KdcInputPartition],
      confBc.value.value, fieldNames, filters, limit, topN)
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
                         filters: Array[Filter],
                         limit: Option[Int] = None,
                         topN: Option[KdcTopN] = None)
    extends PartitionReader[InternalRow] {

  Option(KdcPartitionReader.openTap.get).foreach(_.add(part.path))
  private val limitN: Int = limit.getOrElse(Int.MaxValue)
  private var emitted: Long = 0L

  private val split = new FileSplit(new Path(part.path), part.start, part.length, null)
  private val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
    conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
  private val reader = {
    val r = new graft.kdc.KdcSessionInputFormat().createRecordReader(split, ctx)
    r.initialize(split, ctx)
    r
  }
  private val extractors: Array[KdcLogRecord => Any] =
    fieldNames.map { f =>
      if (KdcLogTable.baseFieldNames(f)) KdcFilterEval.extractor(f)
      else { val v = part.partValues.getOrElse(f, null); (_: KdcLogRecord) => v }
    }
  private var sessions: Iterator[KdcLogRecord] = Iterator.empty
  private var current: InternalRow = _

  private def buildRow(rec: KdcLogRecord): InternalRow = {
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) {
      vals(i) = extractors(i)(rec) match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Partial top-N pushdown: the whole split is parsed ONCE into a
    * bounded n-record heap ordered by ts (see
    * [[KdcScanBuilder.pushTopN]] for why parse-all-keep-n rather than
    * early-stop), and [[next]] drains the heap. `null` when no top-N
    * is pushed — the streaming path below runs instead. */
  private val topRecords: Iterator[KdcLogRecord] = topN match {
    case None => null
    case Some(t) =>
      // "better-first" total order on ts per the pushed SortOrder
      val better = new java.util.Comparator[KdcLogRecord] {
        override def compare(a: KdcLogRecord, b: KdcLogRecord): Int = {
          val (ta, tb) = (a.ts, b.ts)
          if (ta == null && tb == null) 0
          else if (ta == null) { if (t.nullsFirst) -1 else 1 }
          else if (tb == null) { if (t.nullsFirst) 1 else -1 }
          else { val c = ta.compareTo(tb); if (t.asc) c else -c }
        }
      }
      // root = WORST retained row: evict it when a better one arrives
      val heap = new java.util.PriorityQueue[KdcLogRecord](
        math.max(t.n, 1), better.reversed())
      while (reader.nextKeyValue()) {
        val it = Sessionizer.sessionize(
          reader.getCurrentValue.toString.linesIterator)
        while (it.hasNext) {
          val rec = it.next()
          if (KdcFilterEval.matches(filters, rec, part.partValues)) {
            if (heap.size < t.n) heap.offer(rec)
            else if (better.compare(rec, heap.peek) < 0) {
              heap.poll(); heap.offer(rec)
            }
          }
        }
      }
      // emission order is irrelevant: partial pushdown keeps Spark's
      // global sort-and-limit on top
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        heap.iterator()).asScala
  }

  override def next(): Boolean = {
    if (topRecords != null) {
      if (!topRecords.hasNext) return false
      current = buildRow(topRecords.next())
      emitted += 1
      return true
    }
    // partial LIMIT pushdown: this split has produced its quota —
    // stop WITHOUT reading further bytes (Spark re-applies the
    // global limit, so over-per-split is the only contract needed)
    if (emitted >= limitN) return false
    while (true) {
      if (sessions.hasNext) {
        val rec = sessions.next()
        if (KdcFilterEval.matches(filters, rec, part.partValues)) {
          current = buildRow(rec)
          emitted += 1
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
  override def close(): Unit = {
    Option(KdcPartitionReader.emitTap.get).foreach(_.addAndGet(emitted))
    reader.close()
  }
}

/** Test-only observability taps: `null` (the default) costs one
  * volatile read per reader OPEN/CLOSE — never per row. Specs install
  * a sink, run, read it back, and uninstall; nothing accumulates when
  * no tap is set, so a long-lived session carries no growth. */
object KdcPartitionReader {
  /** When set, every reader open records its file path. */
  val openTap = new java.util.concurrent.atomic.AtomicReference[
    java.util.concurrent.ConcurrentLinkedQueue[String]](null)
  /** When set, every reader close adds its emitted-session count. */
  val emitTap = new java.util.concurrent.atomic.AtomicReference[
    java.util.concurrent.atomic.AtomicLong](null)
}

/** Exact evaluation of pushed `sources.Filter`s against a typed
  * [[KdcLogRecord]] (plus the file's partition-column values), with
  * SQL ternary null semantics (a comparison on a null field is
  * UNKNOWN — the row is filtered, and `Not(UNKNOWN)` stays UNKNOWN).
  * Only filters [[supports]] accepts are pushed, so evaluation here is
  * total. String comparisons are lexical — which for the fixed-width
  * ISO `ts` field IS chronological order (`KDCLogRecord.java:249`),
  * making ts range predicates pushable; partition values are plain
  * strings, so the same holds for `day=YYYY-MM-DD` layouts. */
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

  def supports(fields: Set[String], f: Filter): Boolean = f match {
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
    case sources.Not(child) => supports(fields, child)
    case sources.And(l, r) => supports(fields, l) && supports(fields, r)
    case sources.Or(l, r) => supports(fields, l) && supports(fields, r)
    case _ => false
  }

  /** Row-level: base fields resolve from the typed record, partition
    * fields from the file's path values. */
  def matches(filters: Array[Filter], rec: KdcLogRecord,
              part: Map[String, String]): Boolean = {
    val lookup: String => Any = a =>
      if (KdcLogTable.baseFieldNames(a)) extractor(a)(rec)
      else part.getOrElse(a, null)
    filters.forall(f => eval(f, lookup) eq java.lang.Boolean.TRUE)
  }

  /** File-level: every row of the file shares these partition values,
    * so a partition-only predicate that is FALSE or UNKNOWN rejects
    * the whole file — exact, not advisory. Callers pass only filters
    * whose references are all partition keys. */
  def matchesPartition(partOnlyFilters: Seq[Filter],
                       part: Map[String, String]): Boolean = {
    val lookup: String => Any = a => part.getOrElse(a, null)
    partOnlyFilters.forall(f => eval(f, lookup) eq java.lang.Boolean.TRUE)
  }

  /** Three-valued evaluation: TRUE / FALSE / null (UNKNOWN). */
  private def eval(f: Filter, value: String => Any): java.lang.Boolean = f match {
    case sources.EqualTo(a, v) =>
      val x = value(a)
      if (x == null) null else java.lang.Boolean.valueOf(x == v)
    case sources.In(a, vs) =>
      val x = value(a)
      if (x == null) null else java.lang.Boolean.valueOf(vs.contains(x))
    case sources.GreaterThan(a, v: String) => cmp(a, value, _ > 0, v)
    case sources.GreaterThanOrEqual(a, v: String) => cmp(a, value, _ >= 0, v)
    case sources.LessThan(a, v: String) => cmp(a, value, _ < 0, v)
    case sources.LessThanOrEqual(a, v: String) => cmp(a, value, _ <= 0, v)
    case sources.IsNull(a) =>
      java.lang.Boolean.valueOf(value(a) == null)
    case sources.IsNotNull(a) =>
      java.lang.Boolean.valueOf(value(a) != null)
    case sources.StringStartsWith(a, prefix) =>
      val x = value(a)
      if (x == null) null
      else java.lang.Boolean.valueOf(x.asInstanceOf[String].startsWith(prefix))
    case sources.StringContains(a, needle) =>
      val x = value(a)
      if (x == null) null
      else java.lang.Boolean.valueOf(x.asInstanceOf[String].contains(needle))
    case sources.Not(child) =>
      val b = eval(child, value)
      if (b == null) null else java.lang.Boolean.valueOf(!b.booleanValue())
    case sources.And(l, r) =>
      (eval(l, value), eval(r, value)) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) =>
          java.lang.Boolean.FALSE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.TRUE
      }
    case sources.Or(l, r) =>
      (eval(l, value), eval(r, value)) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) =>
          java.lang.Boolean.TRUE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.FALSE
      }
    case other =>
      throw new IllegalStateException(s"unsupported pushed filter $other")
  }

  private def cmp(a: String, value: String => Any, ok: Int => Boolean,
                  v: String): java.lang.Boolean = {
    val x = value(a)
    if (x == null) null
    else java.lang.Boolean.valueOf(ok(x.asInstanceOf[String].compareTo(v)))
  }
}

/** Streaming offset: just the high-water micro-batch id. The files a
  * batch admitted live in the checkpoint's batchId-keyed manifest log
  * ([[KdcFileManifest]]), so the offset JSON the engine re-serializes
  * into every trigger's offset log is O(1) — a fleet that has tailed
  * millions of files carries an integer, not the file list (the
  * unbounded-offset growth FileStreamSource-style map offsets have). */
case class KdcBatchOffset(batchId: Long) extends Offset {
  override def json(): String = s"""{"batchId":$batchId}"""
}

object KdcBatchOffset {
  def fromJson(json: String): KdcBatchOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val m = org.json4s.jackson.Serialization.read[Map[String, Long]](json)
    m.get("batchId").map(KdcBatchOffset(_)).getOrElse(
      throw new IllegalStateException(
        "kdclog: offset JSON carries no batchId — this checkpoint predates the " +
          s"batch-id offset format (legacy file-map offsets are not readable); start " +
          s"a fresh checkpoint. Offset was: ${json.take(200)}"))
  }
}

/** BatchId-keyed manifest of admitted files under the source's own
  * checkpoint location: file `<dir>/<batchId>` holds the JSON map
  * `path -> modification time` of exactly the files that batch
  * admitted — a delta, not a cumulative snapshot, so replay of batch
  * N reads one file. The directory carries a `_format` marker file
  * (`{"version":2}`, [[KdcFileManifest.FormatVersion]]) declaring the
  * value semantics: version 2 = modification times (what `maxFileAge`
  * retention ages on). A checkpoint written before the marker existed
  * carried either file LENGTHS (the oldest format) or mod times (the
  * immediately-pre-marker format) — indistinguishable on disk, and
  * membership semantics are identical for every vintage, so such a
  * legacy checkpoint resumes correctly as long as `maxFileAge` is not
  * set; WITH it set the horizon could misread lengths as mod times
  * (bogus horizon, mass purge at the first compaction, after which
  * purged files could re-admit), so the unverifiable combination
  * FAILS LOUDLY at manifest load instead of relying on a doc
  * sentence. The marker is written only when the stream starts on an
  * empty manifest — a resumed legacy checkpoint is never
  * retroactively stamped (its old entries might be lengths, and
  * stamping would forge exactly the misread the marker exists to
  * block).
  * Every `compactInterval` batches the stream also writes
  * `<batchId>.compact` — the FULL seen-file set at that id — and
  * retires deltas already covered by the PREVIOUS snapshot (kept, so
  * the replayable delta window always spans at least one full
  * interval; the engine only ever replays its most recent uncommitted
  * batch). Restart load cost is therefore one snapshot plus the
  * recent deltas, and the manifest file count stays bounded at
  * ~2×interval + 2 instead of growing with every batch the tail has
  * ever run. Writes are atomic (temp + rename) and idempotent per id:
  * after a crash between manifest write and the engine's offset-log
  * write, the orphan id is overwritten by the next admission. */
private[v2] object KdcFileManifest {
  /** Declared manifest format: 2 = delta/snapshot values are file
    * MODIFICATION TIMES. 1 (implicit — no `_format` marker on disk)
    * was file lengths. See the class scaladoc for the resume rules. */
  private[v2] val FormatVersion = 2

  /** Loaded manifest state: delta entries and compact snapshots
    * (batchId-ascending) plus the declared format version (None = no
    * marker on disk — an empty dir or a pre-marker legacy
    * checkpoint). */
  final case class State(
      deltas: scala.collection.immutable.SortedMap[Long, Map[String, Long]],
      snaps: scala.collection.immutable.SortedMap[Long, Map[String, Long]],
      version: Option[Int])
}

private[v2] class KdcFileManifest(dir: Path, conf: Configuration) {
  private implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
  private val fs = dir.getFileSystem(conf)
  private val formatPath = new Path(dir, "_format")

  private def readBytes(p: Path): String = {
    val in = fs.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readMap(p: Path): Map[String, Long] =
    org.json4s.jackson.Serialization.read[Map[String, Long]](readBytes(p))

  /** All manifest state on disk — see [[KdcFileManifest.State]]. */
  def load(): KdcFileManifest.State = {
    val empty = scala.collection.immutable.SortedMap.empty[Long, Map[String, Long]]
    if (!fs.exists(dir)) return KdcFileManifest.State(empty, empty, None)
    val deltas = scala.collection.immutable.SortedMap.newBuilder[Long, Map[String, Long]]
    val snaps = scala.collection.immutable.SortedMap.newBuilder[Long, Map[String, Long]]
    var version: Option[Int] = None
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && name.forall(_.isDigit))
        deltas += name.toLong -> readMap(st.getPath)
      else if (st.isFile && name.endsWith(".compact") &&
               name.stripSuffix(".compact").forall(_.isDigit))
        snaps += name.stripSuffix(".compact").toLong -> readMap(st.getPath)
      else if (st.isFile && name == "_format")
        version = org.json4s.jackson.Serialization
          .read[Map[String, Int]](readBytes(st.getPath)).get("version")
    }
    KdcFileManifest.State(deltas.result(), snaps.result(), version)
  }

  private def writeAtomic(target: Path, json: String): Unit = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".${target.getName}.tmp")
    val outStream = fs.create(tmp, true)
    try outStream.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally outStream.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"kdclog: failed to commit manifest $target")
  }

  /** Atomically (over)write the delta manifest for `batchId`. */
  def write(batchId: Long, files: Map[String, Long]): Unit =
    writeAtomic(new Path(dir, batchId.toString),
      org.json4s.jackson.Serialization.write(files))

  /** Atomically (over)write the full-seen-set snapshot for `batchId`. */
  def writeSnapshot(batchId: Long, files: Map[String, Long]): Unit =
    writeAtomic(new Path(dir, s"$batchId.compact"),
      org.json4s.jackson.Serialization.write(files))

  /** Stamp the `_format` marker (callers guard: only on a manifest
    * that was EMPTY at load — see the class scaladoc). */
  def writeFormat(): Unit =
    writeAtomic(formatPath, s"""{"version":${KdcFileManifest.FormatVersion}}""")

  /** Retire deltas at or below `coveredId` (they are covered by the
    * snapshot at that id) and snapshots strictly below it. */
  def clean(coveredId: Long): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      val stale =
        (name.forall(_.isDigit) && name.toLong <= coveredId) ||
          (name.endsWith(".compact") &&
            name.stripSuffix(".compact").forall(_.isDigit) &&
            name.stripSuffix(".compact").toLong < coveredId)
      if (st.isFile && stale) fs.delete(st.getPath, false)
    }
  }
}

/** Micro-batch stream over a growing KDC log directory: each batch
  * admits the (lexically ordered) files not yet recorded in the
  * manifest log at or below the start offset, bounded by
  * `maxFilesPerTrigger` when set, and plans them through the SAME
  * split-aligned partitions, pushed predicates, and pruned schema as
  * the batch scan. Offsets are O(1) batch ids ([[KdcBatchOffset]]);
  * the admitted-file deltas live in the source's checkpoint-scoped
  * [[KdcFileManifest]], so neither the offset log nor the per-trigger
  * offset JSON grows with the file count. Implements
  * [[SupportsTriggerAvailableNow]] so `Trigger.AvailableNow` replays a
  * backlog in multiple bounded batches (the engine's generic wrapper
  * would jump to the prepared end in one batch, defeating the
  * admission bound).
  *
  * Fleet-scale bounds: [[KdcFileLayout.listFiles]] is ONE driver-side
  * directory walk per trigger — `latestOffset` refreshes the listing,
  * `reportLatestOffset` and `planInputPartitions` reuse that trigger's
  * snapshot (fresh files carry their listed metadata straight into
  * split planning, so no per-file re-listing either) — O(dirs)
  * namenode RPC per trigger, the FileStreamSource posture. The
  * in-memory seen-file set and the `.compact` snapshots are bounded by
  * the `maxFileAge` RETENTION WINDOW when set (e.g. `"7d"` — Spark
  * duration syntax): entries whose file modification time falls behind
  * (latest mod time seen − maxFileAge) are dropped at compaction, and
  * a visible-but-unseen file older than that horizon is NOT admitted —
  * on a real log fleet (rotation = new files forever) state is
  * O(files per retention window), not O(files ever). The contract
  * edges, both inherent to mod-time retention (FileStreamSource has
  * the same): a file delivered LATE with an ancient mod time is
  * silently skipped once the horizon has passed it, and a purged file
  * re-delivered with a FRESH mod time is admitted again (at-least-once
  * across the horizon). Retention also assumes lexical admission order
  * roughly tracks modification order — true for rotation-named logs
  * (`day=`/timestamp-named files), but a backlog whose lexical order
  * diverges from mod-time order can have old files skipped once a much
  * newer one is admitted (set no `maxFileAge` for such layouts).
  * Without `maxFileAge` the seen set is O(files
  * ever admitted) — exactly-once with unbounded state, the right
  * default for bounded fixtures.
  *
  * Scoped tails: Spark builds streaming scans WITHOUT running filter
  * pushdown (as of 4.1), so partition-path predicates cannot prune a
  * tail the way they prune a batch scan. Two reader options carry the
  * same whole-file pruning to the streaming path:
  *
  *  - `scope=k=v[,k=v…]`: partition-path equality scope (the CLI
  *    `--scope` syntax). Scoped-out DIRECTORIES are skipped before
  *    being listed (a `host=kdc7` subtree costs zero RPCs to a
  *    `host=kdc1`-scoped tail) and scoped-out files are never
  *    admitted; a key the layout does not expose fails loudly at
  *    planning ([[KdcScan]]) — which means a SCOPED tail requires the
  *    `k=v` layout to be discoverable when the stream starts (create
  *    the first scoped directory before starting, or start unscoped):
  *    the fail-loud key check is deliberate, because deferring it
  *    would let a typo'd key tail forever admitting nothing. Values
  *    compare RAW against path segments
  *    ([[KdcFileLayout.parseScope]]).
  *  - `maxFileAgeDirKey=k` (requires `maxFileAge`): declares that
  *    partition key `k`'s values are ISO-8601 UTC date(-time)
  *    PREFIXES (`day=2015-11-22`, `hour=2015-11-22T13`). Directories
  *    whose value is lexically behind the retention horizon —
  *    truncated to the value's own granularity, so the horizon's
  *    partial period is always kept — are skipped BEFORE being
  *    listed: the per-trigger walk is proportional to the LIVE
  *    WINDOW, not the fleet's full rotation history. The directory's
  *    declared date is authoritative for this pruning: a file written
  *    late into an out-of-window directory is never seen (with plain
  *    `maxFileAge` the admission gate skips it by mod time anyway;
  *    the option's contract is the same data, minus the listing
  *    cost).
  *
  * Observability: files the age gate skips (visible, unseen, mod time
  * behind the horizon) are COUNTED per trigger — a WARN fires on
  * first occurrence per stream instance, and the counts surface in
  * every progress event's source metrics (`skippedTooOldFiles`,
  * `skippedTooOldFilesTotal`) — so a misconfigured window or a
  * backlog whose lexical order diverged from mod-time order reads as
  * a visible signal, not as an inexplicably quiet source. */
class KdcMicroBatchStream(path: String, options: Map[String, String],
                          partKeys: Seq[String],
                          requiredSchema: StructType, filters: Array[Filter],
                          checkpointLocation: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics
    with org.apache.spark.internal.Logging {

  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)

  private val recursive = options.get("recursive").exists(_.toBoolean)

  /** Partition-path equality scope — see the class scaladoc. Key
    * validation happened in [[KdcScan]] (planning-time, loud). */
  private val scope: Map[String, String] =
    options.get("scope").map(KdcFileLayout.parseScope).getOrElse(Map.empty)

  /** Partition key whose ISO date(-time) values gate directory
    * listing against the retention horizon — see the class scaladoc. */
  private val horizonDirKey: Option[String] = options.get("maxFileAgeDirKey")

  /** Write a full-seen-set snapshot (and retire covered deltas) every
    * this many batches; <= 0 disables compaction. */
  private val compactInterval: Int =
    options.get("manifestCompactInterval").map(_.toInt).getOrElse(10)

  /** Retention window (Spark duration syntax, e.g. "7d") bounding the
    * seen-file set: see the class scaladoc for the exact semantics.
    * Unset = keep everything (exact once, unbounded state). */
  private val maxFileAgeMs: Option[Long] =
    options.get("maxFileAge").map(
      org.apache.spark.network.util.JavaUtils.timeStringAsMs)

  /** Age horizon given the current seen set: mod times at or above it
    * are inside the retention window. Computed from the SEEN set's max
    * mod time (not the wall clock — retention must be deterministic
    * under replay and immune to clock skew between driver and
    * filesystem). */
  private def horizon(seen: Map[String, Long]): Option[Long] =
    maxFileAgeMs.flatMap { age =>
      if (seen.isEmpty) None
      else Some(seen.valuesIterator.max - age)
    }

  private val manifest = new KdcFileManifest(
    new Path(checkpointLocation, "kdc-file-manifest"),
    SparkSession.active.sparkContext.hadoopConfiguration)

  /** Manifest state (delta entries + compact snapshots + declared
    * format), lazily restored from the checkpoint once per stream
    * instance. `legacyManifest` = entries exist but no `_format`
    * marker: a pre-marker checkpoint whose values are file LENGTHS —
    * fine to resume (membership semantics identical) but NEVER
    * stamped with the marker and NEVER combined with `maxFileAge`
    * (the horizon would misread lengths as mod times). */
  private var deltas: scala.collection.immutable.SortedMap[Long, Map[String, Long]] = _
  private var snaps: scala.collection.immutable.SortedMap[Long, Map[String, Long]] = _
  private var manifestVersion: Option[Int] = None
  private var legacyManifest = false
  private def ensureLoaded(): Unit = synchronized {
    if (deltas == null) {
      val st = manifest.load()
      deltas = st.deltas; snaps = st.snaps; manifestVersion = st.version
      legacyManifest =
        st.version.isEmpty && (st.deltas.nonEmpty || st.snaps.nonEmpty)
      st.version.filter(_ > KdcFileManifest.FormatVersion).foreach { v =>
        throw new IllegalStateException(
          s"kdclog: checkpoint manifest declares format v$v, newer than this " +
            s"reader's v${KdcFileManifest.FormatVersion} — resume with the " +
            "writer's version or start a fresh checkpoint")
      }
      if (legacyManifest && maxFileAgeMs.isDefined)
        throw new IllegalStateException(
          "kdclog: maxFileAge is set over a checkpoint whose file manifest " +
            "predates the _format marker, so its value semantics cannot be " +
            "verified — depending on the writer's vintage they are file " +
            "LENGTHS (oldest format) or modification times. If they are " +
            "lengths, the retention horizon would misread them: a bogus " +
            "horizon purges every entry at the first compaction, after which " +
            "already-processed files can re-admit. Resume WITHOUT maxFileAge " +
            "(membership semantics are identical for every vintage), or start " +
            "a fresh checkpoint.")
    }
  }

  /** Every file admitted at or below batch `b`: the newest snapshot at
    * or below `b`, plus the deltas after it. */
  private def seenUpTo(b: Long): Map[String, Long] = {
    val snap = snaps.rangeTo(b).lastOption
    val base = snap.map(_._2).getOrElse(Map.empty[String, Long])
    deltas.range(snap.map(_._1).getOrElse(-1L) + 1, b + 1)
      .valuesIterator.foldLeft(base)(_ ++ _)
  }

  /** Bound captured by prepareForTriggerAvailableNow: files visible at
    * query start; AvailableNow batches never admit past it. */
  @volatile private var prepared: Option[Map[String, KdcFileLayout.KdcFileMeta]] = None

  /** The horizon the `prepared` walk was DIRECTORY-PRUNED with (None =
    * no horizon pruning applied). prepareForTriggerAvailableNow runs
    * before the engine reveals the start offset, so its seen set may
    * still include orphan deltas of a crashed run — whose fresh mod
    * times would compute a TOO-NEW horizon, and a listing dir-pruned
    * with it would hide in-window directories from every subsequent
    * trigger (silent loss, not the skip counter's visible kind).
    * [[latestOffset]] therefore re-walks instead of reusing `prepared`
    * whenever this horizon is NEWER than the trigger's own (computed
    * AFTER orphan truncation); on the no-crash path the two horizons
    * are equal and the one-walk bound holds. */
  @volatile private var preparedHorizon: Option[Long] = None

  /** The most recent trigger's listing — `latestOffset` refreshes it,
    * `reportLatestOffset`/`planInputPartitions` reuse it (one walk per
    * trigger; see the class scaladoc). */
  @volatile private var lastListing: Option[Map[String, KdcFileLayout.KdcFileMeta]] = None

  /** The horizon rendered into the `maxFileAgeDirKey` value domain:
    * ISO-8601 UTC seconds (`2015-11-22T13:00:00`) — partition values
    * are compared as lexical PREFIXES of this (a `day=` value
    * compares against the first 10 chars), so any ISO granularity
    * from year to second prunes correctly. */
  private def isoHorizon(h: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(math.max(0L, h)))

  /** Walk the visible log files ([[KdcFileLayout.listFiles]]:
    * file/dir/glob + recursive, hidden names skipped at every level)
    * and record the snapshot for this trigger's other callers.
    * Lenient — a tailed directory may not exist yet. Directories the
    * `scope` excludes, or whose `maxFileAgeDirKey` date value is
    * wholly behind `tooOld`, are pruned BEFORE being listed; scoped
    * files are then filtered exactly (a file can sit outside every
    * `k=v` directory and must still not admit into a scoped tail). */
  private def refreshListing(tooOld: Option[Long])
      : Map[String, KdcFileLayout.KdcFileMeta] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val horizonIso: Option[String] =
      if (horizonDirKey.isDefined) tooOld.map(isoHorizon) else None
    val dirFilter: Path => Boolean =
      if (scope.isEmpty && horizonIso.isEmpty) _ => true
      else { d =>
        val n = d.getName
        val eq = n.indexOf('=')
        if (eq <= 0) true
        else {
          val k = n.substring(0, eq)
          val v = n.substring(eq + 1)
          scope.get(k).forall(_ == v) &&
            !(horizonDirKey.contains(k) &&
              horizonIso.exists(h => v < h.take(v.length)))
        }
      }
    val listed = KdcFileLayout.listFiles(path, recursive, conf,
      strict = false, dirFilter)
    val files =
      if (scope.isEmpty) listed
      else {
        val values = KdcFileLayout.partValuesAll(
          path, listed.map(_.path), partKeys, conf)
        listed.filter(st =>
          scope.forall { case (k, v) => values(st.path).get(k).contains(v) })
      }
    val m = files.map(st => st.path.toString -> st).toMap
    lastListing = Some(m)
    m
  }

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    ensureLoaded()
    val high = (deltas.lastOption.map(_._1) ++ snaps.lastOption.map(_._1))
      .foldLeft(-1L)(math.max)
    val tooOld = horizon(seenUpTo(high))
    preparedHorizon = if (horizonDirKey.isDefined) tooOld else None
    prepared = Some(refreshListing(tooOld))
  }

  override def initialOffset(): Offset = KdcBatchOffset(-1L)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  /** Age-gate observability (see the class scaladoc): files skipped
    * as too-old in the latest trigger, and the cumulative count of
    * DISTINCT files skipped over this stream instance's lifetime — a
    * permanently-behind file that stays visible must not re-count
    * every trigger (a 1 s tail would read one late file as ~86k
    * "skipped files" after a day). `skippedPaths` is bounded by the
    * visible-but-behind-horizon file set: entries leave when the file
    * does. The WARN fires once per stream instance, on the first
    * trigger that skips a NEW file. */
  private val skippedTooOldTotal = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var skippedTooOldLast = 0L
  @volatile private var warnedTooOld = false
  private var skippedPaths: Set[String] = Set.empty

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    val startId = start.asInstanceOf[KdcBatchOffset].batchId
    ensureLoaded()
    // manifest ids above the start offset are orphans of a run that
    // crashed between manifest write and the engine's offset-log
    // write — drop them; the next admission overwrites their files
    deltas = deltas.rangeTo(startId)
    snaps = snaps.rangeTo(startId)
    val seen = seenUpTo(startId)
    val tooOld = horizon(seen)
    // reuse the prepared AvailableNow listing only if it was NOT
    // dir-pruned with a newer horizon than this trigger's (orphan
    // deltas at prepare time can inflate it — see preparedHorizon);
    // a listing pruned with an older-or-equal horizon lists a
    // superset, which the admission gate below filters exactly. On
    // the stale path the corrected walk REPLACES the prepared bound
    // (kept coherent for planInputPartitions/reportLatestOffset);
    // later triggers' horizons only advance, so the replacement stays
    // safe and the run is back to one walk per trigger.
    val preparedSafe = preparedHorizon.forall(ph => tooOld.exists(ph <= _))
    val visible = prepared.filter(_ => preparedSafe).getOrElse {
      val m = refreshListing(tooOld)
      if (prepared.isDefined) {
        prepared = Some(m)
        preparedHorizon = if (horizonDirKey.isDefined) tooOld else None
      }
      m
    }
    val unseen = visible.iterator
      .filter { case (p, _) => !seen.contains(p) }.toSeq
    val (inWindow, skipped) = tooOld match {
      case Some(h) => unseen.partition(_._2.modTime >= h)
      case None => (unseen, Seq.empty)
    }
    skippedTooOldLast = skipped.size.toLong
    if (skipped.nonEmpty) {
      val newSkips = skipped.filterNot(f => skippedPaths.contains(f._1))
      if (newSkips.nonEmpty) {
        skippedTooOldTotal.addAndGet(newSkips.size.toLong)
        val msg = s"kdclog: maxFileAge admission gate skipped ${newSkips.size} " +
          s"visible-but-unseen file(s) with modification times behind the " +
          s"retention horizon (e.g. ${newSkips.head._1}) — late-delivered or " +
          "backlogged data behind the window is NOT read; widen maxFileAge or " +
          "start a fresh checkpoint if these files must be admitted"
        if (!warnedTooOld) { warnedTooOld = true; logWarning(msg) }
        else logInfo(msg)
      }
      // membership tracks the files still visible-and-skipped, so the
      // set cannot grow past the live listing
      skippedPaths = skipped.iterator.map(_._1).toSet
    } else skippedPaths = Set.empty
    val fresh = inWindow
      .map { case (p, st) => p -> st.modTime }
      .sortBy(_._1)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    if (admitted.isEmpty) KdcBatchOffset(startId)
    else {
      val id = startId + 1
      // stamp the format marker exactly once, and only on a manifest
      // that started EMPTY (a resumed legacy checkpoint keeps its
      // marker-less state so the maxFileAge guard stays armed forever)
      if (manifestVersion.isEmpty && !legacyManifest) {
        manifest.writeFormat()
        manifestVersion = Some(KdcFileManifest.FormatVersion)
      }
      manifest.write(id, admitted.toMap)
      deltas = deltas + (id -> admitted.toMap)
      if (compactInterval > 0 && id > 0 && id % compactInterval == 0) {
        val full = seen ++ admitted
        // retention: drop seen entries behind the horizon — they can
        // never be admitted again (the admission gate above holds the
        // same line), so carrying them only grows the snapshot
        val snapshot = horizon(full) match {
          case Some(h) => full.filter(_._2 >= h)
          case None => full
        }
        manifest.writeSnapshot(id, snapshot)
        val prev = snaps.rangeTo(id - 1).lastOption.map(_._1)
        snaps = snaps + (id -> snapshot)
        // retire what the PREVIOUS snapshot already covers, keeping
        // that snapshot itself so the replayable delta window always
        // spans at least one full interval
        prev.foreach { p =>
          manifest.clean(p)
          deltas = deltas.rangeFrom(p + 1)
          snaps = snaps.rangeFrom(p)
        }
      }
      KdcBatchOffset(id)
    }
  }

  /** Latest AVAILABLE offset, for source-lag metrics: the id the
    * stream would reach if it admitted the whole visible backlog now
    * (admission-bounded by maxFilesPerTrigger) — reporting only the
    * last ADMITTED id would read as zero backlog no matter how far
    * behind the tail is. */
  override def reportLatestOffset(): Offset = synchronized {
    ensureLoaded()
    val high = (deltas.lastOption.map(_._1) ++ snaps.lastOption.map(_._1))
      .foldLeft(-1L)(math.max)
    val seen = seenUpTo(high)
    val tooOld = horizon(seen)
    // reuse this trigger's listing (latestOffset just refreshed it);
    // only a metrics call arriving before any trigger walks itself
    val visible = prepared.orElse(lastListing).getOrElse(refreshListing(tooOld))
    val freshCount = visible
      .count { case (p, st) =>
        !seen.contains(p) && tooOld.forall(st.modTime >= _)
      }.toLong
    val pendingBatches =
      if (freshCount == 0L) 0L
      else maxFilesPerTrigger.map(m => (freshCount + m - 1L) / m).getOrElse(1L)
    KdcBatchOffset(high + pendingBatches)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KdcBatchOffset].batchId
    val e = end.asInstanceOf[KdcBatchOffset].batchId
    if (e <= s) return Array.empty
    ensureLoaded()
    val have = synchronized(deltas)
    val missing = (s + 1).to(e).filterNot(have.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"kdclog: manifest entries ${missing.mkString(",")} absent under " +
          s"$checkpointLocation — checkpoint is damaged, predates the batch-id " +
          "offset format, or the replay reaches behind the compaction window")
    val fresh = have.range(s + 1, e + 1).valuesIterator
      .flatMap(_.keysIterator).toSeq.sorted
    if (fresh.isEmpty) Array.empty
    else {
      // fresh files usually carry their metadata in this trigger's
      // listing — plan from it directly (no per-file re-listing, and
      // consistent with the admitted state even if a file changed
      // since). Restart replay plans from a fresh stream instance
      // whose listing is empty — those fall back to per-file listing.
      val known = prepared.orElse(lastListing).getOrElse(Map.empty)
      val conf = new Configuration(
        SparkSession.active.sparkContext.hadoopConfiguration)
      KdcLogTable.confPairs(options).foreach { case (k, v) => conf.set(k, v) }
      val metas = fresh.map { p =>
        known.getOrElse(p,
          KdcFileLayout.listFiles(p, recursive = false, conf, strict = true) match {
            case Seq(one) => one
            case other => throw new IllegalStateException(
              s"kdclog: admitted file $p resolved to ${other.size} files on replay")
          })
      }
      KdcBatch.splitsForListed(metas, options, path, partKeys, filters)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KdcReaderFactory(KdcLogTable.readerConf(options), requiredSchema.fieldNames,
      filters.filterNot(f =>
        f.references.nonEmpty && f.references.forall(partKeys.contains)))

  /** Progress-event source metrics: the age-gate skip counts (see the
    * class scaladoc) — zero in both slots on a healthy tail. */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset])
      : util.Map[String, String] =
    Map(
      "skippedTooOldFiles" -> skippedTooOldLast.toString,
      "skippedTooOldFilesTotal" -> skippedTooOldTotal.get().toString
    ).asJava

  override def deserializeOffset(json: String): Offset = KdcBatchOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
