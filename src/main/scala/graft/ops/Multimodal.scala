package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns: opaque `binary` payloads +
  * typed metadata, with decode / feature-extract / resize /
  * frame-sample implemented as *batched* `mapPartitions` kernels over a
  * typed Dataset — the Scala analog of `mapInPandas` (same contract:
  * iterator-of-batches in, iterator-of-batches out, codec initialized
  * once per partition, amortized across batches).
  *
  * Decode is REAL for everything the JDK ships codecs for:
  * [[JdkCodec]] handles PNG/JPEG/BMP/GIF via `javax.imageio` and
  * 16-bit PCM WAV/AIFF via `javax.sound.sampled`, and [[resizeImages]]
  * produces actually-resized PNG payloads — all exercised on genuinely
  * encoded bytes in MultimodalSpec. Video container METADATA is real
  * too: [[Mp4]] walks ISO-BMFF boxes (ftyp/moov/mvhd/trak/stsd) with
  * no codec dependency, exercised on genuinely built container bytes
  * by `media_mp4_meta` and the specs. [[StubCodec]] (deterministic
  * fake signal) remains for (a) video frame DECODE, where the JDK has
  * no demuxer and an external codec would be wired into the same
  * trait, and (b) the driver queries, whose testdata payloads are
  * text stand-ins, not real media.
  *
  * Scale posture (100 TB of media):
  *  - Binary payloads never shuffle: every operator reduces bytes →
  *    small feature rows inside the scan stage; only features move.
  *  - Batched iteration bounds peak memory to `batchSize` decoded
  *    items per task regardless of partition size.
  *  - The media table derives deterministically from `documents`
  *    (text bytes as stand-in payload), so the inventory query is
  *    still DuckDB-oracle-checkable.
  */
object Multimodal {

  // ------------------------------------------------------------- schema

  final case class MediaMeta(
      width: Int, height: Int, channels: Int,
      sample_rate: Int, n_frames: Int, format: String)

  final case class MediaRecord(
      media_id: Long, kind: String, data: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      mean: Double, std: Double, histogram: Seq[Long])

  final case class FrameSample(
      media_id: Long, frame_idx: Int, offset_ms: Long, checksum: Long)

  // -------------------------------------------------------------- codec

  /** Decode boundary. Production: wrap an actual image/audio codec.
    * Here: [[StubCodec]], a deterministic fake. */
  trait MediaCodec extends Serializable {
    def init(): Unit
    def decode(rec: MediaRecord): Array[Double]
  }

  /** STUB — NOT a real decoder. Emits a deterministic pseudo-signal
    * (splitmix64 stream seeded by the payload bytes) with the length
    * implied by the metadata, standing in for pixels/samples until a
    * real codec is wired in. Tracks `init()` calls so tests can assert
    * once-per-partition initialization. */
  final class StubCodec extends MediaCodec {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true; StubCodec.initCount.incrementAndGet() }
    override def decode(rec: MediaRecord): Array[Double] = {
      require(initialized, "codec used before init()")
      val n = math.min(rec.kind match {
        case "image" => rec.meta.width * rec.meta.height
        case "audio" => rec.meta.sample_rate / 100
        case _       => rec.meta.n_frames * 16
      }, 4096)
      var state = rec.data.foldLeft(0x9e3779b97f4a7c15L)((a, b) => (a * 31) ^ b)
      Array.fill(math.max(n, 1)) {
        state += 0x9e3779b97f4a7c15L
        var z = state
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) & 0xffffL).toDouble / 65535.0
      }
    }
  }
  object StubCodec {
    val initCount = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** REAL decoder for the formats the JDK ships codecs for — no
    * external libraries needed: `javax.imageio` (PNG/JPEG/BMP/GIF →
    * row-major luminance in [0,1]) and `javax.sound.sampled` (WAV/AIFF
    * 16-bit PCM → normalized samples). Video stays a hard boundary
    * (the JDK has no demuxer; that is [[StubCodec]]'s remaining
    * domain, clearly marked). Exercised on genuinely encoded PNG/WAV
    * bytes in MultimodalSpec; the driver queries keep the stub because
    * the testdata's stand-in payloads are not real media. */
  final class JdkCodec extends MediaCodec {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true }

    override def decode(rec: MediaRecord): Array[Double] = {
      require(initialized, "codec used before init()")
      val in = new java.io.ByteArrayInputStream(rec.data)
      rec.kind match {
        case "image" =>
          val img = javax.imageio.ImageIO.read(in)
          require(img != null, s"media ${rec.media_id}: undecodable image")
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Double](w * h)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              out(i) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
              i += 1
              x += 1
            }
            y += 1
          }
          out
        case "audio" =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16,
            s"media ${rec.media_id}: only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}")
          require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"media ${rec.media_id}: only signed PCM supported, got ${fmt.getEncoding}")
          val bytes = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val out = new Array[Double](bytes.length / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort() / 32768.0; i += 1 }
          out
        case other =>
          throw new UnsupportedOperationException(
            s"no JDK demuxer for kind=$other — wire an external codec or use StubCodec")
      }
    }
  }

  // ----------------------------------------------------------- builders

  /** Deterministic media table from `documents`: payload = UTF-8 text
    * bytes (opaque stand-in), kind by doc_id mod 3, metadata derived
    * from payload length. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = kind match {
          case "image" => MediaMeta(64, math.max(bytes.length / 64, 1), 3, 0, 0, "fake-rgb")
          case "audio" => MediaMeta(0, 0, 1, 16000, 0, "fake-pcm")
          case _       => MediaMeta(32, 32, 3, 0, math.max(bytes.length / 100, 1), "fake-mp4")
        }
        MediaRecord(id, kind, bytes, meta)
      }
  }

  /** Batched mapPartitions driver: init codec once per partition, feed
    * it `batchSize` records at a time (the mapInPandas batch contract). */
  private def inBatches[T, U](codec: MediaCodec, batchSize: Int)(
      f: (MediaCodec, Seq[T]) => Iterator[U])(it: Iterator[T]): Iterator[U] = {
    if (!it.hasNext) Iterator.empty
    else {
      codec.init()
      it.grouped(batchSize).flatMap(batch => f(codec, batch))
    }
  }

  // ---------------------------------------------------------- operators

  /** Decode + feature-extract: mean/std/8-bin histogram of the decoded
    * signal. Bytes in, 11 small columns out — nothing binary survives
    * past the scan stage. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64,
                      codec: () => MediaCodec = () => new StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(inBatches[MediaRecord, MediaFeatures](codec(), batchSize) {
      (codec, batch) =>
        batch.iterator.map { rec =>
          val sig = codec.decode(rec)
          // an empty-but-valid payload (e.g. a 0-frame WAV) must not
          // emit NaN features
          val n = math.max(sig.length, 1)
          val mean = sig.sum / n
          val std = math.sqrt(sig.map(x => (x - mean) * (x - mean)).sum / n)
          val hist = Array.ofDim[Long](8)
          // bins cover [0,1]; clamp so out-of-range signals (audio is
          // in [-1,1]) land in the edge bins instead of crashing
          sig.foreach(x => hist(math.max(math.min((x * 8).toInt, 7), 0)) += 1)
          MediaFeatures(rec.media_id, rec.kind, rec.data.length, mean, std, hist.toSeq)
        }
    })
  }

  /** Metadata-level resize over stand-in payloads: re-derive metadata +
    * content checksum at target dims (the plumbing columns only — for
    * real image bytes use [[resizeImages]]). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .map { rec =>
        val checksum = rec.data.foldLeft(17L)((a, b) => a * 31 + b)
        (rec.media_id, rec.meta.width, rec.meta.height, w, h, checksum)
      }
      .toDF("media_id", "src_w", "src_h", "dst_w", "dst_h", "checksum")
  }

  /** REAL image resize: decode with ImageIO, bilinear-rescale with
    * Graphics2D, re-encode as PNG — new MediaRecords with resized
    * payload bytes and updated metadata. Batched like every other
    * kernel; bytes stay inside the task (resized output is typically
    * written straight back out partitioned, never shuffled). */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   batchSize: Int = 64): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.data))
          require(img != null, s"media ${rec.media_id}: undecodable image")
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          rec.copy(data = bos.toByteArray,
            meta = rec.meta.copy(width = w, height = h, format = "png"))
        }
      }
    }
  }

  /** Frame sampling for videos: every `stride`-th frame up to `maxFrames`,
    * one output row per sampled frame (Generator-shaped: flatMap). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2,
                   maxFrames: Int = 8, batchSize: Int = 64,
                   codec: () => MediaCodec = () => new StubCodec): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .mapPartitions(inBatches[MediaRecord, FrameSample](codec(), batchSize) {
        (codec, batch) =>
          batch.iterator.flatMap { rec =>
            val sig = codec.decode(rec)
            val idxs = (0 until rec.meta.n_frames by stride).take(maxFrames)
            idxs.map { i =>
              val v = sig(i % sig.length)
              FrameSample(rec.media_id, i, i * 40L, (v * 1e9).toLong)
            }
          }
      })
  }

  /** 64-bit average hash (aHash) per image — the classic perceptual
    * fingerprint: partition the decoded luminance into 64 cells, set
    * bit k iff cell k's mean exceeds the global mean. Visually-similar
    * images land within small Hamming distance, so image NEAR-DUP
    * detection becomes [[graft.ops.Dedup]]'s block-pair Hamming join
    * over 8-byte hashes — the binary payloads themselves never
    * shuffle. For REAL images, pass the frame through [[resizeImages]]
    * (8, 8) first so the 64 cells are the bilinear-resampled pixels
    * (the textbook aHash); the flat-slice fallback here makes the
    * hash well-defined for any decodable signal length. */
  def imageAHashes(media: Dataset[MediaRecord], batchSize: Int = 64,
                   codec: () => MediaCodec = () => new StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(inBatches[MediaRecord, (Long, Long)](codec(), batchSize) {
        (c, batch) =>
          batch.iterator.map { rec =>
            val sig = c.decode(rec)
            val n = sig.length
            val cells = Array.tabulate(64) { k =>
              val lo = (n.toLong * k / 64).toInt
              val hi = math.min(math.max((n.toLong * (k + 1) / 64).toInt, lo + 1), n)
              if (lo >= n) 0.0
              else {
                var s = 0.0; var i = lo
                while (i < hi) { s += sig(i); i += 1 }
                s / (hi - lo)
              }
            }
            val mean = cells.sum / 64
            var h = 0L
            var k = 0
            while (k < 64) { if (cells(k) > mean) h |= (1L << k); k += 1 }
            (rec.media_id, h)
          }
      }).toDF("media_id", "ahash")
  }

  /** Image near-dup pairs by aHash Hamming distance ≤ `maxHamming`
    * (block-pair candidate join — never all-pairs). */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 6,
                        codec: () => MediaCodec = () => new StubCodec): DataFrame =
    graft.ops.Dedup.hamming64Pairs(
        imageAHashes(media, codec = codec)
          .select(col("media_id").as("doc_id"), col("ahash").as("simhash")),
        maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Audio fingerprints, Haitsma–Kalker (ISMIR'02) shape: overlapping
    * frames (window 36 samples, hop 18) split into 9 sub-band
    * energies; bit b of a frame's fingerprint is the SIGN of the
    * time-and-band second difference
    * `(E(f,b) − E(f,b+1)) − (E(f−1,b) − E(f−1,b+1))` — the robust
    * temporal-change code audio matching uses (a constant signal codes
    * to 0; only CHANGES across frames set bits, spec-pinned). Emits
    * (media_id, frame_idx ≥ 1, fp ∈ [0, 256)): matching then becomes
    * a plain equi/Hamming join on tiny codes — the payload never
    * shuffles, the same posture as [[imageAHashes]].
    *
    * The sub-band energies here are TIME-DOMAIN segment energies (4
    * samples each) — a real deployment swaps in an FFT frontend at the
    * decode boundary; the fingerprint derivation (framing, band
    * differencing, sign code) is the part this operator exercises, and
    * every float op is a fixed-order fold the oracle mirrors. */
  def audioFingerprints(media: Dataset[MediaRecord], batchSize: Int = 64,
                        codec: () => MediaCodec = () => new StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    val W = 36; val H = 18; val NB = 9; val SB = 4
    media.filter(_.kind == "audio")
      .mapPartitions(inBatches[MediaRecord, (Long, Int, Long)](codec(), batchSize) {
        (c, batch) =>
          batch.iterator.flatMap { rec =>
            val sig = c.decode(rec)
            val nFrames = if (sig.length < W) 0 else (sig.length - W) / H + 1
            def energy(f: Int, b: Int): Double = {
              var s = 0.0
              var i = 0
              while (i < SB) {
                val x = sig(f * H + b * SB + i)
                s += x * x
                i += 1
              }
              s
            }
            (1 until nFrames).iterator.map { f =>
              var fp = 0L
              var b = 0
              while (b < NB - 1) {
                val d = (energy(f, b) - energy(f, b + 1)) -
                  (energy(f - 1, b) - energy(f - 1, b + 1))
                if (d > 0) fp |= 1L << b
                b += 1
              }
              (rec.media_id, f, fp)
            }
          }
      }).toDF("media_id", "frame_idx", "fp")
  }

  // ------------------------------------------------------ MP4 box walk

  /** Parsed ISO-BMFF container metadata: major brand (`ftyp`), movie
    * timescale + duration in ms (`moov/mvhd`, versions 0 and 1), track
    * count (`moov/trak`), and each track's first sample-entry codec
    * fourcc (`trak/mdia/minf/stbl/stsd`). */
  final case class Mp4Meta(brand: String, timescale: Long, duration_ms: Long,
                           n_tracks: Int, codecs: Seq[String])

  /** Pure-JVM MP4 / ISO-BMFF (ISO 14496-12) box walk — container
    * METADATA is public-format byte arithmetic and needs no codec
    * dependency, so the video kind's metadata leg is REAL parsing even
    * while frame DECODE stays behind [[StubCodec]] (the JDK has no
    * demuxer). Handles 32-bit sizes, `size==1` 64-bit largesize,
    * `size==0` box-extends-to-EOF, and mvhd versions 0 (32-bit
    * duration) and 1 (64-bit); any truncated, overrunning, undersized,
    * or structurally missing box FAILS LOUDLY — corrupt media must
    * read as an error, not as zeros. */
  object Mp4 {
    private def u16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"mp4: $msg")

    /** The child boxes of byte range [start, end) as (type,
      * payloadStart, payloadEnd) — one flat level; callers recurse. */
    private def children(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = start
      while (o < end) {
        if (end - o < 8) fail(s"truncated box header at offset $o")
        var size = u32(b, o)
        val typ = fourcc(b, o + 4)
        var hdr = 8
        if (size == 1L) {
          if (end - o < 16) fail(s"truncated largesize header at offset $o")
          size = u64(b, o + 8); hdr = 16
        } else if (size == 0L) size = (end - o).toLong
        if (size < hdr) fail(s"box '$typ' at $o declares size $size < its $hdr-byte header")
        if (size > end - o) fail(s"box '$typ' at $o overruns its container (size $size, ${end - o} bytes left)")
        out += ((typ, o + hdr, o + size.toInt))
        o += size.toInt
      }
      out.result()
    }

    private def find(boxes: Seq[(String, Int, Int)], typ: String,
                     where: String): (Int, Int) =
      boxes.collectFirst { case (`typ`, s, e) => (s, e) }
        .getOrElse(fail(s"$where has no $typ box"))

    def parse(bytes: Array[Byte]): Mp4Meta = {
      val top = children(bytes, 0, bytes.length)
      val (fs, fe) = find(top, "ftyp", "file")
      if (fe - fs < 4) fail("ftyp too short for a major brand")
      val brand = fourcc(bytes, fs)
      val (ms, me) = find(top, "moov", "file")
      val moov = children(bytes, ms, me)
      val (vs, ve) = find(moov, "mvhd", "moov")
      // the version byte itself needs payload: an 8-byte (empty) mvhd
      // must fail the loud way, not as an array index error
      if (ve - vs < 4) fail("mvhd truncated")
      val version = bytes(vs) & 0xff
      val (timescale, duration) = version match {
        case 0 =>
          if (ve - vs < 20) fail("mvhd v0 truncated")
          (u32(bytes, vs + 12), u32(bytes, vs + 16))
        case 1 =>
          if (ve - vs < 32) fail("mvhd v1 truncated")
          (u32(bytes, vs + 20), u64(bytes, vs + 24))
        case other => fail(s"unsupported mvhd version $other")
      }
      if (timescale <= 0) fail("mvhd declares a zero timescale")
      val traks = moov.collect { case ("trak", s, e) => (s, e) }
      val codecs = traks.map { case (s, e) =>
        var range = (s, e)
        Seq("mdia", "minf", "stbl").foreach { n =>
          range = find(children(bytes, range._1, range._2), n, "trak path")
        }
        val (ss, se) = find(children(bytes, range._1, range._2), "stsd", "stbl")
        if (se - ss < 16) fail("stsd truncated")
        if (u32(bytes, ss + 4) < 1) fail("stsd declares no sample entries")
        fourcc(bytes, ss + 12)
      }
      Mp4Meta(brand, timescale, duration * 1000L / timescale,
        traks.size, codecs)
    }

    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)
    private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(body.length + 8L) ++
        typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
    }

    /** Deterministic minimal-but-structurally-real MP4: ftyp + moov
      * (mvhd v0/v1 with the standard full-box field widths, one trak →
      * mdia → minf → stbl → stsd chain per codec) + a small mdat. The
      * fixture generator for [[Multimodal.mp4MetaQuery]] and the
      * specs — testdata payloads are text stand-ins, so real container
      * bytes are synthesized, then parsed by the REAL box walk. */
    def build(brand: String, timescale: Long, duration: Long,
              mvhdVersion: Int, codecs: Seq[String]): Array[Byte] = {
      require(mvhdVersion == 0 || mvhdVersion == 1, s"mvhd version $mvhdVersion")
      val mvhd =
        if (mvhdVersion == 0)
          box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
            be32(timescale), be32(duration),
            be32(0x00010000L), be16(0x0100), new Array[Byte](2 + 8),
            new Array[Byte](36), new Array[Byte](24), be32(0xffffffffL))
        else
          box("mvhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
            be32(timescale), be64(duration),
            be32(0x00010000L), be16(0x0100), new Array[Byte](2 + 8),
            new Array[Byte](36), new Array[Byte](24), be32(0xffffffffL))
      val traks = codecs.map { c =>
        val entry = be32(16) ++
          c.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          new Array[Byte](6) ++ be16(1)
        val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
        box("trak", box("mdia", box("minf", box("stbl", stsd))))
      }
      val moov = box("moov", (mvhd +: traks): _*)
      val mdat = box("mdat", be32(timescale ^ duration))
      box("ftyp",
        brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
        be32(0x200), "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++
        moov ++ mdat
    }
  }

  /** Real container-metadata parse over synthesized-but-real MP4
    * bytes, one per video-kind document: build parameters are pure
    * doc_id arithmetic (so the oracle can state the EXPECTED fields
    * without parsing bytes), the Spark side must recover them by
    * actually walking the boxes it built — a full build→parse round
    * trip per row through [[Mp4]]. */
  def mp4MetaQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .as[Long]
      .map { id =>
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val timescale = 600L * (1L + id % 4)
        val duration = 1000L + (id % 100) * 37L
        val nTracks = (1L + id % 2).toInt
        val codecs = (0 until nTracks).map(t =>
          Seq("avc1", "hev1", "mp4a")(((id + t) % 3).toInt))
        val meta = Mp4.parse(Mp4.build(brand, timescale, duration,
          if (id % 5 == 0) 1 else 0, codecs))
        (id, meta.brand, meta.timescale, meta.duration_ms,
          meta.n_tracks, meta.codecs.mkString(","))
      }
      .toDF("media_id", "brand", "timescale", "duration_ms", "n_tracks", "codecs")
      .orderBy(col("media_id"))
  }

  // ------------------------------------------------------------ queries

  def featureQuery(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"))
      .orderBy(col("media_id"))

  def frameQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(s, dir)).toDF()
      .orderBy(col("media_id"), col("frame_idx"))

  def audioFpQuery(s: SparkSession, dir: String): DataFrame =
    audioFingerprints(mediaTable(s, dir))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Inventory roll-up — derivable from documents with plain SQL, so
    * this one anchors the multimodal table to the DuckDB oracle. */
  def inventoryQuery(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).toDF()
      .select(col("media_id"), col("kind"), length(col("data")).as("n_bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("kind"))

  // ------------------------------------------------- stub-signal oracles
  //
  // [[StubCodec]]'s pseudo-signal is DETERMINISTIC (a splitmix64-style
  // stream seeded by a byte fold over the payload), and the driver
  // payloads are ASCII text stand-ins — so the whole signal is
  // SQL-expressible in DuckDB with the same HUGEINT mod-2^64 recipes
  // that made ann_quantized_topk and simhash bit-exact. The byte fold
  // is mirrored via codepoints, which equals UTF-8 bytes exactly for
  // ASCII payloads (testdata verified ASCII at every SF; real media
  // bytes route through JdkCodec and are spec-checked instead).

  /** 0x9e3779b97f4a7c15 — the seed/stream increment. */
  private val G = "11400714819323198485"

  /** DuckDB twin of the payload seed fold
    * `a ← (a * 31) mod 2^64 XOR byte` (bytes < 0x80 for ASCII, so the
    * sign-extension branch of the JVM's widening never fires). */
  private def seedFold: String =
    s"""list_reduce([CAST($G AS HUGEINT)] ||
       |    list_filter(list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS HUGEINT)), c -> c >= 0),
       |    (a, b) -> xor((a * 31) % ${graft.OracleSql.two64}, b))""".stripMargin

  /** Staged CTEs applying [[StubCodec]]'s finalizer to column `z`
    * (HUGEINT state in [0, 2^64)) of `src`, ending in CTE `ev` where
    * `z` is the decoded double in [0, 1]. Staged because every
    * xor(z, z >> k) uses z twice — inlining would explode the
    * expression (same pattern as OracleSql.m61FmixScalarCtes). */
  private def mixCtes(src: String): String =
    s"""e1 AS (SELECT * REPLACE (xor(z, z >> 30) AS z) FROM $src),
       |e2 AS (SELECT * REPLACE (${graft.OracleSql.mulmod("z", 0xbf58476d1ce4e5b9L)} AS z) FROM e1),
       |e3 AS (SELECT * REPLACE (xor(z, z >> 27) AS z) FROM e2),
       |e4 AS (SELECT * REPLACE (${graft.OracleSql.mulmod("z", 0x94d049bb133111ebL)} AS z) FROM e3),
       |ev AS (SELECT * REPLACE (CAST(xor(z, z >> 31) % 65536 AS DOUBLE) / 65535.0 AS z) FROM e4)""".stripMargin

  /** media_features oracle: regenerate each record's pseudo-signal,
    * then fold mean/std with list_reduce — an explicitly SEQUENTIAL
    * left fold in element order, bit-identical to the Scala kernel's
    * Array sum (a parallel SQL sum() could re-associate the float
    * additions and flip a 6dp rounding). sqrt is IEEE
    * correctly-rounded on both engines. */
  private def featuresOracle: String =
    s"""WITH src AS (
       |  SELECT doc_id AS media_id,
       |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    text,
       |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
       |  FROM documents),
       |sd AS (SELECT media_id, kind, n_bytes, $seedFold AS s0,
       |         GREATEST(LEAST(CASE CAST(media_id % 3 AS INTEGER)
       |             WHEN 0 THEN 64 * GREATEST(n_bytes // 64, 1)
       |             WHEN 1 THEN 160
       |             ELSE GREATEST(n_bytes // 100, 1) * 16 END, 4096), 1) AS n
       |       FROM src),
       |el AS (SELECT media_id, kind, n_bytes, n, i,
       |         ((s0 + (CAST(i AS HUGEINT) + 1) * $G) % ${graft.OracleSql.two64}) AS z
       |       FROM (SELECT *, unnest(range(n)) AS i FROM sd)),
       |${mixCtes("el")},
       |lv AS (SELECT media_id, kind, n_bytes, n, list(z ORDER BY i) AS vs
       |       FROM ev GROUP BY 1, 2, 3, 4),
       |st AS (SELECT *, list_reduce(vs, (a, b) -> a + b) / n AS mean FROM lv)
       |SELECT media_id, kind, n_bytes,
       |  ${graft.OracleSql.round("mean", 6)} AS mean,
       |  ${graft.OracleSql.round(
                "sqrt(list_reduce(list_transform(vs, x -> (x - mean) * (x - mean)), (a, b) -> a + b) / n)",
                6)} AS std
       |FROM st ORDER BY media_id""".stripMargin

  /** media_frame_samples oracle: stride-2/max-8 frame indices per
    * video, each checksummed from the signal element at i mod
    * sig_len. trunc() mirrors Double.toLong (DuckDB's bare
    * double→BIGINT cast rounds instead). */
  private def framesOracle: String =
    s"""WITH src AS (
       |  SELECT doc_id AS media_id, text,
       |    octet_length(CAST(text AS BLOB)) AS n_bytes
       |  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2),
       |sd AS (SELECT media_id, $seedFold AS s0,
       |         GREATEST(n_bytes // 100, 1) AS n_frames,
       |         GREATEST(LEAST(GREATEST(n_bytes // 100, 1) * 16, 4096), 1) AS sig_len
       |       FROM src),
       |fr AS (SELECT media_id, s0, sig_len, i
       |       FROM sd, (SELECT unnest([0, 2, 4, 6, 8, 10, 12, 14]) AS i)
       |       WHERE i < n_frames),
       |el AS (SELECT media_id, i,
       |         ((s0 + (CAST(i % sig_len AS HUGEINT) + 1) * $G) % ${graft.OracleSql.two64}) AS z
       |       FROM fr),
       |${mixCtes("el")}
       |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
       |  CAST(i * 40 AS BIGINT) AS offset_ms,
       |  CAST(trunc(z * 1000000000.0) AS BIGINT) AS checksum
       |FROM ev ORDER BY media_id, frame_idx""".stripMargin

  /** media_ahash oracle: regenerate each image's pseudo-signal, slice
    * it into the kernel's 64 [lo, hi) cells (an equi-join on the cell
    * grid — cells can OVERLAP when n < 64, so this is a range join,
    * not a partition), fold each cell's mean and the cell-mean vector
    * sequentially with list_reduce (same float order as the Scala
    * Array loops), then assemble the 64 threshold bits in HUGEINT and
    * two's-complement to the kernel's signed BIGINT. Validated
    * bit-exact against the kernel at sf0.001 and sf0.01 before being
    * wired in. */
  /** The per-image ahash computation as a reusable CTE chain ending
    * in `ah` = (media_id, ahash) — shared by the ahash row's oracle
    * and the near-dup cluster row's. */
  private def ahashCtes: String =
    s"""src AS (
       |  SELECT doc_id AS media_id, text,
       |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
       |  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 0),
       |sd AS (SELECT media_id, $seedFold AS s0,
       |         GREATEST(LEAST(64 * GREATEST(n_bytes // 64, 1), 4096), 1) AS n
       |       FROM src),
       |el AS (SELECT media_id, n, i,
       |         ((s0 + (CAST(i AS HUGEINT) + 1) * $G) % ${graft.OracleSql.two64}) AS z
       |       FROM (SELECT *, unnest(range(n)) AS i FROM sd)),
       |${mixCtes("el")},
       |cg AS (SELECT media_id, n, k,
       |         (n * k) // 64 AS lo,
       |         LEAST(GREATEST((n * (k + 1)) // 64, (n * k) // 64 + 1), n) AS hi
       |       FROM (SELECT DISTINCT media_id, n FROM sd), (SELECT unnest(range(64)) AS k)),
       |ce AS (SELECT c.media_id, c.k,
       |         list_reduce(list(e.z ORDER BY e.i), (a, b) -> a + b) / (c.hi - c.lo) AS cm
       |       FROM cg c JOIN ev e ON e.media_id = c.media_id AND e.i >= c.lo AND e.i < c.hi
       |       GROUP BY c.media_id, c.k, c.lo, c.hi),
       |mn AS (SELECT media_id, list_reduce(list(cm ORDER BY k), (a, b) -> a + b) / 64 AS mean
       |       FROM ce GROUP BY media_id),
       |hu AS (SELECT ce.media_id,
       |         sum(CASE WHEN ce.cm > mn.mean THEN CAST(1 AS HUGEINT) << ce.k ELSE CAST(0 AS HUGEINT) END) AS h
       |       FROM ce JOIN mn ON ce.media_id = mn.media_id
       |       GROUP BY ce.media_id),
       |ah AS (SELECT media_id,
       |  CAST(CASE WHEN h >= ${graft.OracleSql.two63} THEN h - ${graft.OracleSql.two64} ELSE h END AS BIGINT) AS ahash
       |FROM hu)""".stripMargin

  private def ahashOracle: String =
    s"""WITH $ahashCtes
       |SELECT media_id, ahash FROM ah ORDER BY media_id""".stripMargin

  /** CC over the aHash Hamming pair graph: the oracle re-derives the
    * hashes, takes ALL pairs at hamming ≤ 6 (affordable exactly
    * because the oracle corpus is bounded; the ENGINE uses the
    * complete block-pair join), and runs the shared recursive-CTE
    * component labeling. */
  private def mediaClustersOracle: String =
    s"""WITH RECURSIVE $ahashCtes,
       |pairs AS (SELECT a.media_id AS doc_a, b.media_id AS doc_b
       |          FROM ah a JOIN ah b ON a.media_id < b.media_id
       |          WHERE bit_count(xor(a.ahash, b.ahash)) <= 6),
       |${graft.ops.Dedup.ccFromPairsSql}
       |SELECT doc_id AS media_id, cluster_id FROM labels ORDER BY media_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "media_inventory" -> QueryDef(inventoryQuery, Some(
      """SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  count(*) AS n_media, CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)),
    // Stub-codec outputs over deterministic stand-in payloads: the
    // pseudo-signal itself is mirrored in DuckDB, so both rows are
    // fully hash-checked (shape/once-per-partition-init still in
    // MultimodalSpec).
    "media_features" -> QueryDef(featureQuery, Some(featuresOracle)),
    "media_frame_samples" -> QueryDef(frameQuery, Some(framesOracle)),
    "media_ahash" -> QueryDef((s, d) =>
      imageAHashes(mediaTable(s, d)).orderBy(col("media_id")),
      Some(ahashOracle)),
    // perceptual near-dup CLUSTERS: block-pair Hamming join feeds the
    // shared size-gated component labeling (the media twin of
    // dedup_neardup_clusters)
    "media_neardup_clusters" -> QueryDef((s, d) =>
      graft.ops.Dedup.clustersFromEdges(
          imageNearDupPairs(mediaTable(s, d))
            .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
        .select(col("doc_id").as("media_id"), col("cluster_id"))
        .orderBy(col("media_id")),
      Some(mediaClustersOracle)),
    // REAL ISO-BMFF parsing: the build parameters are doc_id
    // arithmetic, so the oracle states the expected fields directly;
    // the engine must RECOVER them by walking the container bytes it
    // built (build→parse round trip through the Mp4 box walk).
    "media_mp4_meta" -> QueryDef(mp4MetaQuery, Some(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |  CAST(600 * (1 + doc_id % 4) AS BIGINT) AS timescale,
        |  CAST(((1000 + (doc_id % 100) * 37) * 1000) // (600 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        |  array_to_string(list_transform(range(1 + doc_id % 2),
        |    t -> ['avc1','hev1','mp4a'][CAST((doc_id + t) % 3 AS INTEGER) + 1]), ',') AS codecs
        |FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
        |ORDER BY media_id""".stripMargin)),
    // Haitsma–Kalker sign codes over the regenerated pseudo-signal.
    // The stub audio signal is a FIXED 160 samples (sample_rate/100),
    // so the oracle's frame grid is the static range(7) — if the stub
    // metadata ever changes, regenerate both in step.
    "media_audio_fingerprint" -> QueryDef(audioFpQuery, Some(
      s"""WITH src AS (SELECT doc_id AS media_id, text FROM documents
         |  WHERE CAST(doc_id % 3 AS INTEGER) = 1),
         |sd AS (SELECT media_id, $seedFold AS s0 FROM src),
         |el AS (SELECT media_id, i,
         |         ((s0 + (CAST(i AS HUGEINT) + 1) * $G) % ${graft.OracleSql.two64}) AS z
         |       FROM (SELECT *, unnest(range(160)) AS i FROM sd)),
         |${mixCtes("el")},
         |lv AS (SELECT media_id, list(z ORDER BY i) AS vs FROM ev GROUP BY 1),
         |en AS (SELECT media_id, f.range AS f, b.range AS b,
         |         list_reduce(list_transform(
         |           vs[(f.range * 18 + b.range * 4 + 1):(f.range * 18 + b.range * 4 + 4)],
         |           x -> x * x), (a, c) -> a + c) AS e
         |       FROM lv, range(7) f, range(9) b),
         |bits AS (SELECT ec.media_id, ec.f, ec.b,
         |    CASE WHEN (ec.e - ec1.e) - (ep.e - ep1.e) > 0
         |         THEN CAST(1 AS BIGINT) << CAST(ec.b AS INTEGER) ELSE 0 END AS bit
         |  FROM en ec
         |  JOIN en ec1 ON ec1.media_id = ec.media_id AND ec1.f = ec.f AND ec1.b = ec.b + 1
         |  JOIN en ep  ON ep.media_id = ec.media_id AND ep.f = ec.f - 1 AND ep.b = ec.b
         |  JOIN en ep1 ON ep1.media_id = ec.media_id AND ep1.f = ec.f - 1 AND ep1.b = ec.b + 1
         |  WHERE ec.f >= 1 AND ec.b < 8),
         |fp AS (SELECT media_id, f AS frame_idx, CAST(sum(bit) AS BIGINT) AS fp
         |       FROM bits GROUP BY 1, 2)
         |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx, fp
         |FROM fp ORDER BY media_id, frame_idx""".stripMargin)))
}
