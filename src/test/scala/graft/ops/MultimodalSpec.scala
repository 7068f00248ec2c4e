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

  test("resize emits target dims and stable checksums for images only") {
    val r = Multimodal.resize(Multimodal.mediaTable(spark, dir), 224, 224)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x.getInt(3) == 224 && x.getInt(4) == 224))
    assert(rows.forall(_.getLong(0) % 3 == 0), "only image kind (doc_id % 3 == 0)")
  }
}
