package graft.kdc

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Splittable-bzip2 coverage for the shuffle-by-file parse path — the
  * equivalent of the reference's `KDCLogRecordReader.java:179-198`
  * splittable-codec handling. A single multi-block .bz2 log is read
  * with small max splits, so multiple tasks decode disjoint compressed
  * blocks of ONE file; all lines of a block share the reader's
  * block-offset `pos`, and the within-split `seq` tie-break must
  * restore exact line order for the sessionizer. */
class KdcBzip2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("one multi-block bz2 file parses identically to in-memory lines") {
    // ~3 MB uncompressed (> the 900 KB bzip2 block size several times
    // over), sessions with varying user/timestamps so any reorder or
    // loss changes the result multiset.
    val lines = (0 until 40000).flatMap { i =>
      val ts = f"2015-11-22T${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d"
      val user = s"user${i % 97}"
      Seq(
        s"$ts AS-REQ $user@X.ORG from IPv4:10.0.0.${i % 250} for krbtgt/X.ORG@X.ORG",
        s"$ts ENC-TS Pre-authentication succeeded -- $user@X.ORG",
        s"$ts sending ${100 + i % 900} bytes to IPv4:10.0.0.${i % 250}")
    }
    val dir = "target/scratch/bz2"
    new java.io.File(dir).mkdirs()
    val conf = spark.sparkContext.hadoopConfiguration
    val codec = new org.apache.hadoop.io.compress.BZip2Codec
    codec.setConf(conf)
    val out = codec.createOutputStream(
      new java.io.FileOutputStream(s"$dir/big.log.bz2"))
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()

    val prev = conf.get("mapreduce.input.fileinputformat.split.maxsize")
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", 256 * 1024)
    try {
      val viaBz2 = KdcSource.records(spark, s"$dir/big.log.bz2")
        .collect().toSeq
      // multiple splits must actually have been used for the claim to
      // mean anything: compressed size ≈ 60-80 KB/block × several
      assert(new java.io.File(s"$dir/big.log.bz2").length() > 256 * 1024)
      val expected = Sessionizer.sessionize(lines.iterator).toSeq
      assert(viaBz2.size == expected.size)
      assert(viaBz2.groupBy(identity).view.mapValues(_.size).toMap ==
        expected.groupBy(identity).view.mapValues(_.size).toMap)
    } finally {
      if (prev == null)
        conf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else conf.set("mapreduce.input.fileinputformat.split.maxsize", prev)
    }
  }
}
