package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media table covers all kinds with typed metadata") {
    val kinds = Multimodal.mediaTable(spark, dir).collect().groupBy(_.kind)
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds("image").forall(r => r.meta.width == 64 && r.meta.channels == 3))
    assert(kinds("audio").forall(_.meta.sample_rate == 16000))
    assert(kinds("video").forall(_.meta.n_frames >= 1))
  }

  test("stub audio signal length pins the fingerprint oracle's frame grid") {
    // media_audio_fingerprint's DuckDB oracle hardcodes range(160)
    // samples and a 7-frame grid; this pin makes a StubCodec
    // sample_rate/metadata change fail loudly instead of silently
    // diverging the two engines (ADVICE r7).
    val audio = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "audio").head()
    val codec = new Multimodal.StubCodec
    codec.init()
    val sig = codec.decode(audio)
    assert(sig.length == 160,
      s"oracle assumes a fixed 160-sample stub signal, got ${sig.length}")
    val w = 36; val h = 18
    val nFrames = (sig.length - w) / h + 1
    assert(nFrames == 7,
      s"oracle's frame grid is range(7), engine derives $nFrames frames")
  }

  test("feature extraction: deterministic, bounded, one row per media") {
    val media = Multimodal.mediaTable(spark, dir)
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.length == media.count())
    assert(a.map(_.mean).toSeq == b.map(_.mean).toSeq, "stub decode must be deterministic")
    assert(a.forall(f => f.mean >= 0 && f.mean <= 1 && f.histogram.sum > 0))
  }

  test("codec initialized once per non-empty partition, not per batch") {
    val media = Multimodal.mediaTable(spark, dir).repartition(2)
    Multimodal.StubCodec.initCount.set(0)
    // batchSize 10 over ~167 rows/partition => many batches, 2 inits
    Multimodal.extractFeatures(media, batchSize = 10).foreach(_ => ())
    val inits = Multimodal.StubCodec.initCount.get()
    assert(inits == 2, s"expected 2 codec inits (1/partition), got $inits")
  }

  test("frame sampling respects stride and cap, explodes per frame") {
    val fs = Multimodal.sampleFrames(Multimodal.mediaTable(spark, dir),
      stride = 2, maxFrames = 8).collect()
    assert(fs.nonEmpty)
    val byMedia = fs.groupBy(_.media_id)
    for ((_, frames) <- byMedia) {
      assert(frames.length <= 8)
      assert(frames.forall(f => f.frame_idx % 2 == 0))
      assert(frames.forall(f => f.offset_ms == f.frame_idx * 40L))
    }
  }

  test("external video demuxer wires through the MediaCodec seam") {
    // the JDK has no video demuxer; production wires ffmpeg-or-similar
    // through the same trait every other kernel uses. Prove the seam
    // carries a third-party codec end to end with a fake demuxer:
    // payload bytes are treated as n_frames concatenated "frames",
    // each decoding to its mean byte value in [0, 1].
    class FakeDemuxer extends Multimodal.MediaCodec {
      @transient private var ready = false
      override def init(): Unit = { ready = true }
      override def decode(rec: Multimodal.MediaRecord): Array[Double] = {
        require(ready, "codec used before init()")
        require(rec.kind == "video", s"demuxer fed a ${rec.kind}")
        val n = rec.meta.n_frames
        val chunk = math.max(rec.data.length / n, 1)
        Array.tabulate(n) { i =>
          val lo = i * chunk
          val hi = math.min(lo + chunk, rec.data.length)
          if (lo >= rec.data.length) 0.0
          else (lo until hi).map(j => (rec.data(j) & 0xff) / 255.0).sum / (hi - lo)
        }
      }
    }
    import org.apache.spark.sql.functions.col
    val videos = Multimodal.mediaTable(spark, dir).filter(_.kind == "video")
    val local = videos.collect().map { rec =>
      val c = new FakeDemuxer; c.init()
      rec.media_id -> c.decode(rec)
    }.toMap
    assert(local.nonEmpty)
    // features computed through the distributed seam == local decode
    val feats = Multimodal.extractFeatures(videos, codec = () => new FakeDemuxer)
      .collect().map(f => f.media_id -> f.mean).toMap
    val expMeans = local.map { case (id, sig) => id -> sig.sum / math.max(sig.length, 1) }
    assert(feats == expMeans)
    // frame sampling through the same fake codec: checksums are the
    // demuxed per-frame values, not the stub's pseudo-signal
    val frames = Multimodal.sampleFrames(videos, codec = () => new FakeDemuxer)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val sig = local(f.media_id)
      val want = (sig(f.frame_idx % sig.length) * 1e9).toLong
      assert(f.checksum == want, s"media ${f.media_id} frame ${f.frame_idx}")
    }
  }

  test("resize emits target dims and stable checksums for images only") {
    val r = Multimodal.resize(Multimodal.mediaTable(spark, dir), 224, 224)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x.getInt(3) == 224 && x.getInt(4) == 224))
    assert(rows.forall(_.getLong(0) % 3 == 0), "only image kind (doc_id % 3 == 0)")
  }

  // ------------------------------ real JDK codecs on real media bytes

  /** Encode a w×h image whose every pixel is gray level `v` as PNG. */
  private def pngBytes(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode `n` 16-bit PCM samples of a sine at `amp` as WAV. */
  private def wavBytes(n: Int, amp: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      bb.putShort((math.sin(2 * math.Pi * i / 64) * amp * 32767).toShort)
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def realMedia: org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    Seq(
      Multimodal.MediaRecord(0L, "image", pngBytes(8, 4, 128),
        Multimodal.MediaMeta(8, 4, 3, 0, 0, "png")),
      Multimodal.MediaRecord(1L, "image", pngBytes(16, 16, 255),
        Multimodal.MediaMeta(16, 16, 3, 0, 0, "png")),
      Multimodal.MediaRecord(2L, "audio", wavBytes(1024, 0.5),
        Multimodal.MediaMeta(0, 0, 1, 16000, 0, "wav"))
    ).toDS()
  }

  /** w×h PNG: left half gray `l`, right half gray `r`, with `flips`
    * pixels inverted in the top-left corner. */
  private def halfPng(w: Int, h: Int, l: Int, r: Int, flips: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def rgb(v: Int) = (v << 16) | (v << 8) | v
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rgb(if (x < w / 2) l else r))
    for (k <- 0 until flips) img.setRGB(k % w, k / w, rgb(255 - l))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash: near-identical real images pair up, inverted image does not") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRecord(id, "image", bytes,
        Multimodal.MediaMeta(16, 16, 3, 0, 0, "png"))
    val media = Seq(
      rec(0L, halfPng(16, 16, 0, 255)),            // A: dark left, bright right
      rec(1L, halfPng(16, 16, 0, 255, flips = 2)), // B: A with 2 pixels flipped
      rec(2L, halfPng(16, 16, 255, 0))             // C: inverted halves
    ).toDS()
    // textbook aHash: bilinear 8×8 resample, then mean-threshold bits
    val small = Multimodal.resizeImages(media, 8, 8)
    val hashes = Multimodal.imageAHashes(small,
        codec = () => new Multimodal.JdkCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(ham(0L, 1L) <= 4, s"near pair too far: ${ham(0L, 1L)}")
    assert(ham(0L, 2L) >= 32, s"inverted pair too close: ${ham(0L, 2L)}")
    val pairs = Multimodal.imageNearDupPairs(small, maxHamming = 6,
        codec = () => new Multimodal.JdkCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"pairs: $pairs")
  }

  test("JdkCodec decodes real PNG and WAV bytes to correct signals") {
    val feats = Multimodal.extractFeatures(realMedia,
        codec = () => new Multimodal.JdkCodec)
      .collect().map(f => f.media_id -> f).toMap
    // constant gray 128 → every luminance sample = 128/255
    assert(math.abs(feats(0L).mean - 128.0 / 255.0) < 1e-9)
    assert(feats(0L).std < 1e-9)
    // constant white → 1.0
    assert(math.abs(feats(1L).mean - 1.0) < 1e-9)
    // sine at amp 0.5: mean ≈ 0, std ≈ amp/√2
    assert(math.abs(feats(2L).mean) < 0.01)
    assert(math.abs(feats(2L).std - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("resizeImages produces decodable resized PNG payloads") {
    val out = Multimodal.resizeImages(realMedia, 4, 4).collect()
      .sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(0L, 1L))
    for (rec <- out) {
      assert(rec.meta.width == 4 && rec.meta.height == 4)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rec.data))
      assert(img != null && img.getWidth == 4 && img.getHeight == 4)
    }
    // constant-color source stays constant after bilinear resize
    val white = out.find(_.media_id == 1L).get
    val decoded = {
      val c = new Multimodal.JdkCodec; c.init()
      c.decode(white)
    }
    assert(decoded.length == 16 && decoded.forall(v => math.abs(v - 1.0) < 1e-9))
  }
  test("perceptual clusters: identical payloads cluster, distinct ones don't") {
    import spark.implicits._
    // three copies of one payload + one near-copy (few flipped bytes)
    // + two unrelated payloads: the copies and near-copy must form ONE
    // cluster labeled by the min id, the others none (no pairs)
    val base = Array.tabulate(512)(i => (i % 251).toByte)
    val near = base.clone(); near(7) = 99.toByte
    def rec(id: Long, bytes: Array[Byte]) = Multimodal.MediaRecord(
      id, "image", bytes, Multimodal.MediaMeta(64, 8, 3, 0, 0, "fake-rgb"))
    val other = Array.tabulate(512)(i => ((i * 37 + 11) % 241).toByte)
    val media = Seq(rec(0L, base), rec(3L, base), rec(6L, base),
      rec(9L, near), rec(12L, other),
      rec(15L, Array.tabulate(512)(i => ((i * 91 + 5) % 199).toByte))).toDS()
    val pairs = Multimodal.imageNearDupPairs(media)
      .select(org.apache.spark.sql.functions.col("media_a").as("doc_a"),
        org.apache.spark.sql.functions.col("media_b").as("doc_b"))
    val clusters = Dedup.clustersFromEdges(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 3L, 6L).subsetOf(clusters.keySet),
      s"exact copies missing from clusters: $clusters")
    assert(Set(0L, 3L, 6L).map(clusters) == Set(0L),
      s"copies must share the min-id label: $clusters")
    assert(!clusters.contains(12L) && !clusters.contains(15L),
      s"unrelated payloads must not cluster: $clusters")
  }

  test("audio fingerprints: sign codes fire on temporal change, not loudness") {
    import spark.implicits._
    // codec emitting a chosen 160-sample signal regardless of payload
    final class FixedSignal(sig: Array[Double]) extends Multimodal.MediaCodec {
      override def init(): Unit = ()
      override def decode(rec: Multimodal.MediaRecord): Array[Double] = sig
    }
    val audio = Seq(Multimodal.MediaRecord(1L, "audio", Array[Byte](1),
      Multimodal.MediaMeta(0, 0, 1, 16000, 0, "fake-pcm"))).toDS()
    def fps(sig: Array[Double]): Seq[(Int, Long)] =
      Multimodal.audioFingerprints(audio, codec = () => new FixedSignal(sig))
        .orderBy("frame_idx").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // constant signal (even a LOUD one): every band-energy difference
    // is constant across frames → second difference 0 → no bit fires
    val constant = fps(Array.fill(160)(0.9))
    assert(constant.map(_._1) == (1 to 6) && constant.forall(_._2 == 0L),
      s"constant signal must code to 0: $constant")
    // hop-granularity shift robustness — the property the fingerprint
    // exists for: delaying the signal by EXACTLY one hop (18 samples)
    // makes every delayed window f coincide with original window f−1,
    // so fingerprint_delayed(f) == fingerprint_original(f−1) exactly
    val s0 = Array.tabulate(160)(p =>
      ((graft.functions.TextExpressions.fmix64(p + 77L) & 0xffffL).toDouble / 65535.0))
    val delayed = Array.tabulate(160)(p => if (p < 18) 0.0 else s0(p - 18))
    val orig = fps(s0).toMap
    val shift = fps(delayed).toMap
    (2 to 6).foreach { f =>
      assert(shift(f) == orig(f - 1),
        s"frame $f of the delayed signal must equal frame ${f - 1}: $shift vs $orig")
    }
    assert(orig.values.exists(_ != 0L), "the random signal should set some bits")
  }

  test("mp4 box walk: build→parse round trip recovers every field, v0 and v1") {
    import Multimodal.Mp4
    val m0 = Mp4.parse(Mp4.build("isom", 600L, 3000L, 0, Seq("avc1", "mp4a")))
    assert(m0 == Multimodal.Mp4Meta("isom", 600L, 5000L, 2, Seq("avc1", "mp4a")))
    // mvhd v1: 64-bit duration wider than u32 must survive
    val big = 5000000000L // > 2^32
    val m1 = Mp4.parse(Mp4.build("mp42", 1000L, big, 1, Seq("hev1")))
    assert(m1 == Multimodal.Mp4Meta("mp42", 1000L, big, 1, Seq("hev1")))
    // duration_ms is integer milliseconds: duration*1000/timescale
    val m2 = Mp4.parse(Mp4.build("isom", 90000L, 123456L, 0, Seq("avc1")))
    assert(m2.duration_ms == 123456L * 1000L / 90000L)
  }

  test("mp4 box walk: largesize and to-EOF boxes parse; unknown boxes are skipped") {
    import Multimodal.Mp4
    val base = Mp4.build("isom", 600L, 600L, 0, Seq("avc1"))
    // re-wrap the trailing mdat as a largesize box (size==1 + u64)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val mdatAt = {
      // find 'mdat' fourcc
      val idx = base.sliding(4).indexWhere(_.sameElements("mdat".getBytes))
      idx - 4
    }
    val before = base.take(mdatAt)
    val largeMdat = be32(1L) ++ "mdat".getBytes ++ be32(0L) ++ be32(16L + 4L) ++ be32(99L)
    assert(Mp4.parse(before ++ largeMdat).brand == "isom",
      "largesize box broke the walk")
    // size==0: final box extends to EOF
    val eofMdat = be32(0L) ++ "mdat".getBytes ++ be32(7L)
    assert(Mp4.parse(before ++ eofMdat).n_tracks == 1, "to-EOF box broke the walk")
    // an unknown top-level box (e.g. 'free') before moov is skipped
    val free = be32(12L) ++ "free".getBytes ++ be32(0L)
    val ftypLen = 8 + 12 // ftyp box total size in build()
    val withFree = base.take(ftypLen) ++ free ++ base.drop(ftypLen)
    assert(Mp4.parse(withFree).codecs == Seq("avc1"))
  }

  test("mp4 box walk: truncated, overrunning, and structurally broken containers fail loudly") {
    import Multimodal.Mp4
    val good = Mp4.build("isom", 600L, 600L, 0, Seq("avc1"))
    def failsWith(bytes: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Mp4.parse(bytes))
      assert(e.getMessage.contains(needle), s"wanted '$needle' in: ${e.getMessage}")
    }
    // cut mid-box: the declared size overruns what is left
    failsWith(good.dropRight(1), "overruns")
    // cut inside a box header: ftyp (20 bytes) survives, then 5 bytes
    // of the moov header remain — less than the 8-byte minimum
    failsWith(good.take(25), "truncated")
    // a box whose size is smaller than its own header
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    failsWith(be32(4L) ++ "wide".getBytes, "declares size 4 <")
    // no moov at all
    failsWith(good.take(8 + 12), "no moov")
    // an EMPTY (8-byte) mvhd must fail loudly, not as an index error
    val emptyMvhd = good.take(20) ++
      be32(16L) ++ "moov".getBytes ++ be32(8L) ++ "mvhd".getBytes
    failsWith(emptyMvhd, "mvhd truncated")
    // stsd that declares zero sample entries
    val zeroEntries = {
      val b = good.clone()
      val stsdAt = b.sliding(4).indexWhere(_.sameElements("stsd".getBytes)) - 4
      // entry_count is 4 bytes after the stsd version/flags word
      val at = stsdAt + 8 + 4
      b(at) = 0; b(at + 1) = 0; b(at + 2) = 0; b(at + 3) = 0
      b
    }
    failsWith(zeroEntries, "no sample entries")
    // unsupported mvhd version
    val badVersion = {
      val b = good.clone()
      val at = b.sliding(4).indexWhere(_.sameElements("mvhd".getBytes)) + 4
      b(at) = 7
      b
    }
    failsWith(badVersion, "version 7")
  }
}
