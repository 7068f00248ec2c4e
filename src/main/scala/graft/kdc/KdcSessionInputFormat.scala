package graft.kdc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.io.compress.{CodecPool, CompressionCodecFactory, Decompressor}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}
import org.apache.hadoop.util.LineReader

/** Split-aligned KDC *session* input: each record is the full text of
  * one multi-line session (all lines up to and including its
  * `sending N bytes` terminator), with byte-level split alignment —
  * the 100 TB path for single log files larger than one task
  * (SURVEY.md §7.4 #1; the shuffle-by-file [[KdcSource.records]] path
  * stays the default for many-file fleets).
  *
  * Ownership contract (exact partition, no loss/duplication — pinned
  * by KdcAlignedSpec at adversarial split sizes):
  *  - a session belongs to the split containing its FIRST byte;
  *  - each reader keeps emitting sessions whose first byte ≤ its split
  *    end, reading past the end to finish the last one (the
  *    reference's read-past-split-end, `KDCLogRecordReader.java:221-232`);
  *  - a non-first split aligns by seeking a LOOKBACK window before its
  *    start so every line it classifies is complete, then begins at
  *    the end of the first terminator line whose end offset exceeds
  *    `start` — the exact complement of the previous reader's claim.
  *    (Testing possibly-truncated head fragments instead — what the
  *    reference's `matchSending.find()` would do — silently loses a
  *    session whenever a boundary lands inside a terminator line.)
  *  - a session cut off by end-of-file is dropped
  *    (`KDCLogRecordReader.java:317-320`).
  *
  * Compression: compressed inputs are processed one-split-per-file
  * (gzip is never splittable; bzip2 BYBLOCK alignment would need
  * compressed-domain lookback and is deliberately out of scope).
  * This does NOT leave a coverage hole vs the reference's splittable
  * path (`KDCLogRecordReader.java:179-198`): a single huge .bz2 log
  * should go through [[KdcSource.records]], whose Hadoop
  * `TextInputFormat` splits bzip2 at block boundaries natively and
  * whose shuffle-by-file sort restores line order from byte offsets —
  * the parse still fans out across splits; only the one sort shuffle
  * is paid. Uncompressed or rotated-fleet layouts use this aligned
  * format for the zero-shuffle path.
  *
  * Requires lines shorter than the lookback window
  * (`graft.kdc.lookback.bytes`, default 1 MiB).
  */
class KdcSessionInputFormat extends FileInputFormat[LongWritable, Text] {

  override def isSplitable(context: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(context.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit, context: TaskAttemptContext)
      : RecordReader[LongWritable, Text] = new KdcSessionRecordReader
}

class KdcSessionRecordReader extends RecordReader[LongWritable, Text] {

  private def isTerminator(line: String): Boolean =
    LogLine.classify(line) == LineEvent.Sending

  private var start = 0L
  private var end = 0L
  private var pos = 0L // absolute offset of the next unread byte
  private var in: LineReader = _
  private var decompressor: Decompressor = _
  private var compressed = false

  private val key = new LongWritable()
  private val value = new Text()
  private val line = new Text()
  private var finished = false

  override def initialize(genericSplit: InputSplit, context: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val conf: Configuration = context.getConfiguration
    val lookback = conf.getLong("graft.kdc.lookback.bytes", 1L << 20)
    start = split.getStart
    end = start + split.getLength
    val path = split.getPath
    val fs = path.getFileSystem(conf)
    val fileIn: FSDataInputStream = fs.open(path)
    val codec = new CompressionCodecFactory(conf).getCodec(path)

    if (codec != null) {
      // whole file in one split (isSplitable=false) — decompress linearly
      decompressor = CodecPool.getDecompressor(codec)
      in = new LineReader(codec.createInputStream(fileIn, decompressor), conf)
      compressed = true
      pos = 0L
      return
    }

    if (start == 0) {
      in = new LineReader(fileIn, conf)
      pos = 0L
      return
    }

    // lookback alignment: every line we classify must be complete
    val seekPos = math.max(start - lookback, 0L)
    fileIn.seek(seekPos)
    in = new LineReader(fileIn, conf)
    pos = seekPos
    if (seekPos > 0) {
      val n = in.readLine(line) // discard the partial line at seekPos
      if (n == 0) { finished = true; return }
      pos += n
    }
    // begin at the end of the first terminator line ending after start
    var aligned = false
    while (!aligned) {
      val n = in.readLine(line)
      if (n == 0) { finished = true; aligned = true }
      else {
        pos += n
        if (pos > start && isTerminator(line.toString)) aligned = true
      }
    }
  }

  override def nextKeyValue(): Boolean = {
    if (finished) return false
    // a session is ours iff its first byte is ≤ end (read-past-end for
    // the final one); compressed files are single-split → no bound
    if (!compressed && pos > end) { finished = true; return false }
    key.set(pos)
    val sb = new java.lang.StringBuilder()
    var complete = false
    while (!complete) {
      val n = in.readLine(line)
      if (n == 0) { finished = true; return false } // EOF mid-session: drop
      pos += n
      if (sb.length() > 0) sb.append('\n')
      sb.append(line.toString)
      if (isTerminator(line.toString)) complete = true
    }
    value.set(sb.toString)
    true
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value

  override def getProgress: Float =
    if (end == start) 0.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start))

  override def close(): Unit = {
    try if (in != null) in.close()
    finally if (decompressor != null) CodecPool.returnDecompressor(decompressor)
  }
}
