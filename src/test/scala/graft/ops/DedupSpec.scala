package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the approximate dedup operators against the
  * exact n-gram Jaccard ground truth on real testdata (sf0.001 has 25
  * planted near-dup pairs at j ≥ 0.9, next tier below j < 0.2). */
class DedupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup keeps one id per distinct text") {
    val n = Dedup.exactDedup(spark, dir).count()
    val distinctTexts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").distinct().count()
    assert(n == distinctTexts)
  }

  test("minhash LSH recovers exactly the high-jaccard pairs") {
    val exact = pairSet(Dedup.jaccardPairs(spark, dir, threshold = 0.5))
    val lsh = pairSet(Dedup.minhashLshPairs(spark, dir, threshold = 0.5))
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    // LSH candidates are verified with the same exact jaccard, so
    // lsh ⊆ exact always; at j≥0.9 with 32×2 bands recall ≈ 1 - 1e-20.
    assert(lsh == exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("minhash signatures are deterministic across runs") {
    val a = Dedup.minhashSignatures(spark, dir).orderBy("doc_id").limit(5).collect()
    val b = Dedup.minhashSignatures(spark, dir).orderBy("doc_id").limit(5).collect()
    assert(a.map(_.getSeq[Long](1)).toSeq == b.map(_.getSeq[Long](1)).toSeq)
  }

  test("native simhash64 is bit-identical to the HOF bit-vote formulation") {
    // same M61 feature hashes the production simhashes() pipeline uses
    val th = Dedup.shingled(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.textFunctions.m61_token_hashes(
          org.apache.spark.sql.functions.col("shingles")).as("th"))
    val both = th.selectExpr("doc_id",
        """aggregate(th,
          |  transform(sequence(0, 63), i -> 0),
          |  (acc, h) -> zip_with(acc, transform(sequence(0, 63), i -> IF((shiftright(h, i) & 1) = 1, 1, -1)), (x, y) -> x + y),
          |  acc -> aggregate(transform(sequence(0, 63), i -> IF(element_at(acc, i + 1) >= 0, shiftleft(cast(1 AS BIGINT), i), cast(0 AS BIGINT))), cast(0 AS BIGINT), (a, b) -> a + b)
          |) AS hof""".stripMargin)
      .join(Dedup.simhashes(spark, dir), "doc_id")
    assert(both.filter(org.apache.spark.sql.functions.col("hof") =!=
      org.apache.spark.sql.functions.col("simhash")).count() == 0)
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val exact = pairSet(Dedup.jaccardPairs(spark, dir, threshold = 0.9))
    val sim = Dedup.simhashPairs(spark, dir, maxHamming = 8)
    val simSet = pairSet(sim)
    // token-multiset SimHash is coarser than shingle jaccard; demand
    // high recall of the j≥0.9 planted dups rather than exact equality
    val recall = (exact & simSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} sim=${simSet.size}")
  }

  test("cluster propagation converges in O(log diameter) rounds on a long chain") {
    import spark.implicits._
    // 64-node path graph: pure hop propagation needs ~63 rounds; with
    // pointer jumping reach doubles per round → well under 10
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.clustersFromEdgesCounted(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_._2 == 1L), s"chain not fully flooded: ${got.filter(_._2 != 1L).take(5).toSeq}")
    assert(rounds <= 9, s"pointer jumping regressed: $rounds rounds for a 64-chain")
  }

  test("local union-find and distributed propagation agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    val local = Dedup.clustersFromEdges(edges) // under the gate → local
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = Dedup.clustersFromEdgesCounted(edges)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local == dist)
  }

  test("cluster gate accepts the same schemas on both sides") {
    import spark.implicits._
    // string ids would silently null-cast in the local path — the gate
    // must route them to the type-generic distributed loop instead
    val sEdges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")
    val sGot = Dedup.clustersFromEdges(sEdges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    // int ids take the local path under the gate AND keep their type
    // (the distributed path preserves input types; the local path must
    // not widen the schema to bigint across the gate)
    val iEdges = Seq((1, 2), (2, 3)).toDF("doc_a", "doc_b")
    val iOut = Dedup.clustersFromEdges(iEdges)
    assert(iOut.schema("doc_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(iOut.schema("cluster_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(iOut.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      Map(1 -> 1, 2 -> 1, 3 -> 1))
  }

  test("cluster labels close over transitive chains and split components") {
    import spark.implicits._
    // chain 1-2-3-4 (no direct 1~4 edge), separate pair 10-11, and a
    // star 20-{21,22}: min label must flood each whole component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersFromEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("streaming ingest loop produces the batch epoch loop's verdicts exactly") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batchPath = new java.io.File(
      "target/scratch/spec_ingest_batch_" + System.nanoTime()).getAbsolutePath
    val batch = Dedup.ingestEpochsOn(spark, all, batchPath,
        split1 = 400L, split2 = 450L, compactPerAppend = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    val streamPath = new java.io.File(
      "target/scratch/spec_ingest_stream_" + System.nanoTime()).getAbsolutePath
    val stream = Dedup.ingestDedupStreamingOn(spark, all, streamPath,
        split1 = 400L, split2 = 450L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    assert(stream == batch)
    // both epochs really flowed as separate micro-batches, and the
    // second saw epoch-1 admits via the index delta (same guarantee
    // the batch loop's epoch-2 verdict carries)
    assert(stream.count(_._2 == 1L) == 50 && stream.count(_._2 == 2L) == 50)
    // scratch reclaimed after the drain
    assert(!new java.io.File(streamPath).exists())
  }

  test("keyed-append batch replay is idempotent: verdicts and index deltas unchanged") {
    import org.apache.spark.sql.functions.{col, lit}
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val path = new java.io.File(
      "target/scratch/spec_replay_" + System.nanoTime()).getAbsolutePath
    val idx = s"$path/index"
    val vdir = s"$path/verdicts"
    val vSchema = "doc_id BIGINT, epoch BIGINT, exact_dup BOOLEAN, " +
      "near_dup BOOLEAN, admit BOOLEAN"
    Dedup.writePostingIndex(spark, all.filter(col("doc_id") < 400L), idx)
    // the streaming foreachBatch body, verbatim semantics
    def runBatch(bid: Long, lo: Long, hi: Long): Unit = {
      val dropDf = all.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), col("text"))
      Dedup.ingestDedupIndexed(spark, idx, dropDf,
          excludeBatchFrom = Some(bid))
        .withColumn("epoch", lit(bid + 1L))
        .select(col("doc_id"), col("epoch"), col("exact_dup"),
          col("near_dup"), col("admit"))
        .write.mode("overwrite").parquet(s"$vdir/batch=$bid")
      val vdf = spark.read.schema(vSchema).parquet(s"$vdir/batch=$bid")
      Dedup.appendToPostingIndex(spark, Dedup.admittedBatch(dropDf, vdf), idx,
        compact = false, batchKey = Some(bid))
    }
    def state() = (
      spark.read.schema(vSchema).parquet(vdir)
        .select(col("doc_id"), col("epoch"), col("exact_dup"),
          col("near_dup"), col("admit"))
        .orderBy(col("doc_id")).collect().toSeq,
      spark.read.schema("doc_id BIGINT, g BIGINT, gb INT, batch BIGINT")
        .parquet(s"$idx/delta/postings")
        .orderBy(col("doc_id"), col("g")).collect().toSeq,
      spark.read.schema("content_hash STRING, batch BIGINT")
        .parquet(s"$idx/exact_delta")
        .orderBy(col("content_hash")).collect().toSeq)
    runBatch(0L, 400L, 450L)
    val after1 = state()
    runBatch(0L, 400L, 450L) // at-least-once REPLAY of batch 0
    assert(state() == after1, "replaying batch 0 changed durable state")
    // the next batch still sees batch 0's admits through the keyed
    // delta — the whole run equals the serial epoch loop's verdicts
    runBatch(1L, 450L, Long.MaxValue)
    val keyed = state()._1.map(r => (r.getLong(0), r.getLong(1),
      r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    val serialPath = new java.io.File(
      "target/scratch/spec_replay_serial_" + System.nanoTime()).getAbsolutePath
    val serial = Dedup.ingestEpochsOn(spark, all, serialPath,
        split1 = 400L, split2 = 450L, compactPerAppend = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    assert(keyed == serial)
    // compaction folds the keyed delta AND exact_delta back into the
    // baseline; the folded index answers like a fresh full build
    Dedup.compactPostingIndex(spark, idx)
    assert(!new java.io.File(s"$idx/delta").exists())
    assert(!new java.io.File(s"$idx/exact_delta").exists())
    val freshPath = new java.io.File(
      "target/scratch/spec_replay_fresh_" + System.nanoTime()).getAbsolutePath
    val admitted = all.filter(col("doc_id") < 400L).select(col("doc_id"), col("text"))
      .unionByName(Dedup.admittedBatch(all,
          spark.read.schema(vSchema).parquet(vdir))
        .select(col("doc_id"), col("text")))
    Dedup.writePostingIndex(spark, admitted, freshPath)
    val probe = all.filter(col("doc_id") >= 480L).select(col("doc_id"), col("text"))
    val viaCompacted = Dedup.ingestDedupIndexed(spark, idx, probe).collect().toSeq
    val viaFresh = Dedup.ingestDedupIndexed(spark, freshPath, probe).collect().toSeq
    assert(viaCompacted == viaFresh)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(serialPath))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(freshPath))
  }

  test("an append that admits nothing leaves the index queryable") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val path = new java.io.File(
      "target/scratch/spec_empty_delta_" + System.nanoTime()).getAbsolutePath
    import org.apache.spark.sql.functions.col
    Dedup.writePostingIndex(spark, all.filter(col("doc_id") < 400L), path)
    val plain = Dedup.ingestDedupIndexed(spark, path,
      all.filter(col("doc_id") >= 400L)).collect().toSeq
    // a drop where every doc is rejected appends an EMPTY delta — the
    // dir exists with no data files; queries must not trip schema
    // inference on it and verdicts must be unchanged (df_delta = 0)
    Dedup.appendToPostingIndex(spark, all.filter(col("doc_id") < -1L), path,
      compact = false)
    val withEmptyDelta = Dedup.ingestDedupIndexed(spark, path,
      all.filter(col("doc_id") >= 400L)).collect().toSeq
    assert(withEmptyDelta == plain)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
  }

  test("streaming exact-dedup groups converge to the batch aggregate") {
    val batch = Dedup.exactDupGroups(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = Dedup.exactDupGroupsStreaming(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("span dedup: shared passage flagged with exact coverage, unique and within-doc repeats don't trigger") {
    import spark.implicits._
    val run = (1 to 20).map(i => s"shared$i").mkString(" ") // 20-token passage
    val uniqA = (1 to 10).map(i => s"a$i").mkString(" ")
    val uniqB = (1 to 10).map(i => s"b$i").mkString(" ")
    val uniqC = (1 to 40).map(i => s"c$i").mkString(" ")
    // d3 repeats ITS OWN 16-token run twice — within one doc only
    val selfRep = (1 to 16).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (0L, s"$uniqA $run"),         // 30 tokens, passage at the tail
      (1L, s"$run $uniqB"),         // 30 tokens, passage at the head
      (2L, uniqC),                  // 40 unique tokens
      (3L, s"$selfRep $selfRep"))   // 32 tokens, self-repeat
      .toDF("doc_id", "text")
    val got = Dedup.spanDupStatsOn(docs, k = 16, minDocs = 2L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    // docs 0/1: the shared 20-token run yields 5 duplicated 16-gram
    // spans each; the interval union covers exactly the 20 run tokens
    assert(got(0L) == ((30L, 15L, 5L, 0.6667, false)), s"${got(0L)}")
    assert(got(1L) == ((30L, 15L, 5L, 0.6667, false)), s"${got(1L)}")
    assert(got(2L) == ((40L, 25L, 0L, 0.0, true)), s"${got(2L)}")
    // within-doc repetition alone never flags (DISTINCT doc contract)
    assert(got(3L) == ((32L, 17L, 0L, 0.0, true)), s"${got(3L)}")
  }

  test("char span dedup catches a whitespace-mangled duplicate the word-level row structurally misses") {
    import spark.implicits._
    val words = (1 to 24).map(i => f"shared$i%02d") // 24 × 8 chars = 192
    val clean = words.mkString(" ")
    val mangled = words.mkString("  ") // double spaces: every split token pair straddles a ""
    val docs = Seq(
      (0L, s"AAAAAAAAAA $clean"),    // 202 stripped chars, passage at the tail
      (1L, s"$mangled BBBBBBBBBB"),  // 202 stripped chars, passage at the head
      (2L, "C" * 60))                // unique
      .toDF("doc_id", "text")
    // word-level k=16: the mangled doc's token stream carries a ""
    // token in every window (split on single space), so NO 16-gram
    // matches the clean twin — the blind spot this row exists for
    val word = Dedup.spanDupStatsOn(docs, k = 16, minDocs = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(5))).toMap
    assert(word(0L) == ((0L, true)) && word(1L) == ((0L, true)), s"$word")
    // char-level k=48 strips the whitespace: the 192-char passage is
    // byte-identical in both docs — 145 duplicated spans each, the
    // interval union covering exactly the passage
    val ch = Dedup.charSpanDupStatsOn(docs, k = 48, minDocs = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(ch(0L) == ((202L, 155L, 145L, 0.9505, false)), s"${ch(0L)}")
    assert(ch(1L) == ((202L, 155L, 145L, 0.9505, false)), s"${ch(1L)}")
    assert(ch(2L) == ((60L, 13L, 0L, 0.0, true)), s"${ch(2L)}")
  }

  test("char span dedup: whitespace-only and sub-k docs are handled like the oracle") {
    import spark.implicits._
    val docs = Seq(
      (0L, "   \t  "),            // whitespace-only: vanishes entirely
      (1L, "short text"),          // 9 stripped chars < k: zero spans
      (2L, "short text"))          // its exact twin — still zero spans at k=48
      .toDF("doc_id", "text")
    val got = Dedup.charSpanDupStatsOn(docs, k = 48, minDocs = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 9L, 0L, 0L), (2L, 9L, 0L, 0L)), s"${got.toSeq}")
  }

  test("multi-k span dedup: long passage hits every k, short phrase only k=16, union coverage exact") {
    import spark.implicits._
    val long = (1 to 70).map(i => s"p$i").mkString(" ")  // 70-token passage
    val short = (1 to 20).map(i => s"q$i").mkString(" ") // 20-token phrase
    val docs = Seq(
      (0L, s"${(1 to 10).map(i => s"a$i").mkString(" ")} $long"), // 80 tokens
      (1L, s"$long ${(1 to 10).map(i => s"b$i").mkString(" ")}"), // 80 tokens
      (2L, s"${(1 to 5).map(i => s"c$i").mkString(" ")} $short"), // 25 tokens
      (3L, s"$short ${(1 to 5).map(i => s"d$i").mkString(" ")}"), // 25 tokens
      (4L, (1 to 30).map(i => s"e$i").mkString(" ")))             // unique
      .toDF("doc_id", "text")
    val got = Dedup.multiKSpanStatsOn(docs, ks = Seq(16, 32, 64), minDocs = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))).toMap
    // 70-token shared passage: 70-k+1 duplicated spans per k — the
    // k=64 hits certify the LONG verbatim passage; union covers the
    // 70 passage tokens exactly (70/80 = 0.875)
    assert(got(0L) == ((80L, 55L, 39L, 7L, 0.875, false)), s"${got(0L)}")
    assert(got(1L) == ((80L, 55L, 39L, 7L, 0.875, false)), s"${got(1L)}")
    // 20-token phrase: k=16 spans only — no k=32/64 evidence
    assert(got(2L) == ((25L, 5L, 0L, 0L, 0.8, false)), s"${got(2L)}")
    assert(got(3L) == ((25L, 5L, 0L, 0L, 0.8, false)), s"${got(3L)}")
    assert(got(4L) == ((30L, 0L, 0L, 0L, 0.0, true)), s"${got(4L)}")
    // per-k counts agree with the single-k operator run at that k
    for ((k, idx) <- Seq(16 -> 1, 32 -> 2, 64 -> 3)) {
      val single = Dedup.spanDupStatsOn(docs, k = k, minDocs = 2L)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val multi = got.map { case (id, t) => id -> t.productElement(idx) }
      assert(multi == single, s"k=$k multi=$multi single=$single")
    }
  }

  test("multi-signal clusters honor every contributing signal's pairs") {
    val labels = Dedup.multiSignalClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    def coClustered(pairs: Array[(Long, Long)], name: String): Unit =
      for ((a, b) <- pairs)
        assert(labels.get(a) == labels.get(b) && labels.contains(a),
          s"$name pair ($a,$b) not co-clustered")
    coClustered(Dedup.jaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))), "jaccard")
    coClustered(Dedup.simhashPairs(spark, dir, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))), "simhash")
    coClustered(Similarity.semanticPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))), "semantic")
    // the union must cover at least the jaccard-only node set
    val jaccardOnly = Dedup.neardupClusters(spark, dir).count()
    assert(labels.size >= jaccardOnly,
      s"multi-signal ${labels.size} < jaccard-only $jaccardOnly")
  }

  test("containment catches a short doc inside a long one where jaccard cannot") {
    import spark.implicits._
    val short30 = (1 to 30).map(i => s"s$i").mkString(" ")
    val long300 = short30 + " " + (1 to 270).map(i => s"L$i").mkString(" ")
    val other = (1 to 30).map(i => s"o$i").mkString(" ")
    val docs = Seq((0L, short30), (1L, long300), (2L, other))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairsOn(docs, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    // all 28 of the short doc's 3-gram shingles appear in the long one
    assert(cont.contains((0L, 1L)), s"containment missed: $cont")
    assert(cont((0L, 1L))._1 == 1.0)
    assert(!cont.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    // symmetric jaccard is structurally blind to this pair
    val jac = Dedup.jaccardPairsOn(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)), "jaccard should miss the contained pair")
  }

  test("fuzzy pairs: bounded edit distance refines the candidate stage") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val close = base.replace("tok5", "tok5x")          // 1 char insertion
    val far = base.replace("tok5 tok6 tok7", "aa bb cc") // big rewrite, high token overlap
    val docs = Seq((0L, base), (1L, close), (2L, far),
      (3L, (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairsOn(docs, candThreshold = 0.3, maxDist = 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((0L, 1L)), s"close pair missed: $pairs")
    assert(pairs((0L, 1L)) == 1L)
    assert(!pairs.contains((0L, 2L)), "rewrite beyond maxDist must be refined away")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // widening the bound readmits the rewrite (candidate stage had it)
    val wide = Dedup.fuzzyPairsOn(docs, candThreshold = 0.3, maxDist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((0L, 2L)))
  }

  test("ingest dedup classifies incoming docs against the existing corpus only") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 27).map(i => s"w$i").mkString(" ") + " x1 x2 x3" // jac 27/33 ≈ 0.82
    val docs = Seq(
      (0L, base),                                  // existing
      (1L, (1 to 30).map(i => s"z$i").mkString(" ")), // existing, unrelated
      // incoming batch (ids >= 100):
      (100L, base),                                // exact dup of 0
      (101L, near),                                // near dup of 0
      (102L, (1 to 30).map(i => s"q$i").mkString(" ")), // fresh — admit
      (103L, (1 to 30).map(i => s"q$i").mkString(" "))) // within-batch dup of 102 — still admit
      .toDF("doc_id", "text")
    val got = Dedup.ingestDedupOn(docs, splitId = 100L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(100L) == ((true, true, false)), s"${got(100L)}")   // exact AND near
    assert(got(101L) == ((false, true, false)), s"${got(101L)}")
    assert(got(102L) == ((false, false, true)), s"${got(102L)}")
    // within-batch duplication is NOT this operator's concern
    assert(got(103L) == ((false, false, true)), s"${got(103L)}")
  }

  test("indexed ingest dedup equals the rederiving path, including union-df-cap flips") {
    import spark.implicits._
    // maxBucket = 3 so the df-cap machinery actually fires:
    //  - "h1 h2 h3" in 4 existing docs  -> hot at BUILD time (df_ex > 3)
    //  - "n1 n2 n3" in 2 existing + 2 incoming -> newly hot only under
    //    the UNION (df_ex = 2 <= 3 < 4 = df_u) — the stored sizes must
    //    be corrected for it at query time
    // threshold = 0.05 so a single wrongly-counted shared gram (e.g. a
    // newly-hot one that an implementation forgot to drop) flips a
    // verdict instead of hiding under a high bar.
    val docs = Seq(
      0L -> "h1 h2 h3 a1 a2 a3 n1 n2 n3",
      1L -> "h1 h2 h3 b1 b2 b3 n1 n2 n3",
      2L -> "h1 h2 h3 c1 c2 c3 c4 c5 c6",
      3L -> "h1 h2 h3 d1 d2 d3 d4 d5 d6",
      4L -> (1 to 30).map(i => s"w$i").mkString(" "),
      100L -> "h1 h2 h3 x1 x2 x3 n1 n2 n3",
      101L -> ("n1 n2 n3 " + (1 to 6).map(i => s"y$i").mkString(" ")),
      102L -> ((1 to 27).map(i => s"w$i").mkString(" ") + " x1 x2 x3"),
      103L -> (1 to 30).map(i => s"q$i").mkString(" "))
      .toDF("doc_id", "text")
    val direct = Dedup.ingestDedupOn(docs, splitId = 100L,
        threshold = 0.05, maxBucket = 3)
      .collect().toSeq
    val path = "target/scratch/ingest_index_spec"
    Dedup.writePostingIndex(spark, docs.filter($"doc_id" < 100), path, maxBucket = 3)
    val viaIndex = Dedup.ingestDedupIndexed(spark, path,
      docs.filter($"doc_id" >= 100), threshold = 0.05, maxBucket = 3)
    assert(viaIndex.collect().toSeq == direct)
    val got = direct.map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // 100/101 share ONLY hot or newly-hot grams with the corpus — both
    // cap classes must vanish from the shared counts
    assert(got(100L) == ((false, false, true)), s"${got(100L)}")
    assert(got(101L) == ((false, false, true)), s"${got(101L)}")
    assert(got(102L) == ((false, true, false)), s"${got(102L)}")
    assert(got(103L) == ((false, false, true)), s"${got(103L)}")
    // and the pruned index reads carry a partition filter on gb
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*gb""".r.findFirstIn(plan).isDefined,
      s"no gb partition pruning in plan:\n$plan")
  }

  test("epoch ingest loop: admitted docs join the corpus, rejected docs don't") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val freshF = (1 to 30).map(i => s"f$i").mkString(" ")
    val freshG = (1 to 30).map(i => s"g$i").mkString(" ")
    val nearOfBase = (1 to 27).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val nearOfNear = (1 to 27).map(i => s"w$i").mkString(" ") + " x1 x2 y3"
    val docs = Seq(
      0L -> base,                // existing
      1L -> (1 to 30).map(i => s"z$i").mkString(" "), // existing, unrelated
      // epoch 1 (ids in [100, 200)):
      100L -> freshF,            // admit
      101L -> nearOfBase,        // near dup of 0 → rejected
      102L -> freshG,            // admit
      // epoch 2 (ids >= 200):
      200L -> freshF,            // exact dup of ADMITTED 100 → loop must flag
      201L -> nearOfNear,        // near dup of 0 (and of rejected 101) → reject
      202L -> (1 to 30).map(i => s"q$i").mkString(" "))  // admit
      .toDF("doc_id", "text")
    val path = "target/scratch/ingest_epochs_spec"
    val got = Dedup.ingestEpochsOn(spark, docs, path, split1 = 100L, split2 = 200L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(got(100L) == ((1L, false, false, true)), s"${got(100L)}")
    assert(got(101L) == ((1L, false, true, false)), s"${got(101L)}")
    assert(got(102L) == ((1L, false, false, true)), s"${got(102L)}")
    // 200 duplicates an epoch-1 ADMIT — only the grown index can know
    assert(got(200L) == ((2L, true, true, false)), s"${got(200L)}")
    assert(got(201L) == ((2L, false, true, false)), s"${got(201L)}")
    assert(got(202L) == ((2L, false, false, true)), s"${got(202L)}")
    // rejected and epoch-2 docs never joined the index: after the loop
    // its postings hold exactly existing ∪ epoch-1 admits
    val indexed = spark.read.parquet(s"$path/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(0L, 1L, 100L, 102L), s"index contains $indexed")
  }

  test("batched appends: un-compacted-delta verdicts equal per-append compaction") {
    import spark.implicits._
    // maxBucket = 3, threshold = 0.05 (the indexed test's regime).
    // "n1 n2 n3" is the DELTA-HOT gram: df 2 in the compacted corpus,
    // pushed over the cap by the two APPENDS alone — the correction
    // class that only exists in batched mode.
    val e = Seq(
      0L -> "h1 h2 h3 a1 a2 a3 n1 n2 n3",
      1L -> "h1 h2 h3 b1 b2 b3 n1 n2 n3",
      2L -> "h1 h2 h3 c1 c2 c3 c4 c5 c6",
      3L -> "h1 h2 h3 d1 d2 d3 d4 d5 d6",
      4L -> (1 to 30).map(i => s"w$i").mkString(" "))
    val a1 = Seq(
      100L -> "n1 n2 n3 p1 p2 p3 p4 p5 p6",
      101L -> (1 to 30).map(i => s"r$i").mkString(" "))
    val a2 = Seq(200L -> "n1 n2 n3 q1 q2 q3 q4 q5 q6")
    val b = Seq(
      300L -> "n1 n2 n3 s1 s2 s3 s4 s5 s6", // shares only union-hot grams → admit
      301L -> "p1 p2 p3 p4 p5 p6 x1 x2 x3", // near-dup of DELTA doc 100 → reject
      302L -> "n1 n2 n3 q1 q2 q3 q4 q5 q6", // exact dup of DELTA doc 200 → reject
      303L -> (1 to 30).map(i => s"y$i").mkString(" "), // fresh → admit
      304L -> "c1 c2 c3 c4 c5 c6 z1 z2 z3") // near-dup of COMPACTED doc 2 → reject
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def run(path: String, compactEach: Boolean) = {
      // exact/delta use append mode — wipe any previous test run
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      Dedup.writePostingIndex(spark, df(e), path, maxBucket = 3)
      Dedup.appendToPostingIndex(spark, df(a1), path, maxBucket = 3, compact = compactEach)
      Dedup.appendToPostingIndex(spark, df(a2), path, maxBucket = 3, compact = compactEach)
      Dedup.ingestDedupIndexed(spark, path, df(b), threshold = 0.05, maxBucket = 3)
        .collect().toSeq
    }
    val compacted = run("target/scratch/ingest_batched_c", compactEach = true)
    val pathB = "target/scratch/ingest_batched_d"
    val batched = run(pathB, compactEach = false)
    assert(new java.io.File(s"$pathB/delta/postings").exists(), "delta area missing")
    assert(batched == compacted,
      s"batched=${batched.mkString(",")} compacted=${compacted.mkString(",")}")
    // and both equal the index-free rederiving path over the union
    val direct = Dedup.ingestDedupOn(df(e ++ a1 ++ a2 ++ b), splitId = 300L,
      threshold = 0.05, maxBucket = 3).collect().toSeq
    assert(batched == direct)
    val got = batched.map(r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(300L) == ((false, false, true)), s"${got(300L)}")
    assert(got(301L) == ((false, true, false)), s"${got(301L)}")
    assert(got(302L) == ((true, true, false)), s"${got(302L)}")
    assert(got(303L) == ((false, false, true)), s"${got(303L)}")
    assert(got(304L) == ((false, true, false)), s"${got(304L)}")
    // deferred compaction folds the delta in and changes nothing
    Dedup.compactPostingIndex(spark, pathB, maxBucket = 3)
    assert(!new java.io.File(s"$pathB/delta").exists(), "delta not folded in")
    val after = Dedup.ingestDedupIndexed(spark, pathB, df(b),
      threshold = 0.05, maxBucket = 3).collect().toSeq
    assert(after == compacted)
    val indexed = spark.read.parquet(s"$pathB/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(0L, 1L, 2L, 3L, 4L, 100L, 101L, 200L), s"$indexed")
  }

  test("auto-compaction: the ratio gate folds the delta mid-sequence, verdicts invariant") {
    import spark.implicits._
    def mk(lo: Long, n: Int, tag: String) = (0 until n).map(i =>
      (lo + i) -> (1 to 40).map(j => s"$tag${i}x$j").mkString(" "))
    val base = mk(0L, 8, "b")
    val e1 = mk(100L, 2, "e")
    val e2 = mk(200L, 2, "f")
    val e3 = mk(300L, 2, "g")
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // drive the policy directly: two similar-sized un-compacted appends
    // roughly double the delta bytes, so a threshold of 1.4× the
    // first append's ratio is crossed by the second and not the first
    val path = "target/scratch/ingest_auto_policy"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    Dedup.writePostingIndex(spark, df(base), path)
    assert(Dedup.postingDeltaRatio(path) == 0.0, "no delta yet")
    Dedup.appendToPostingIndex(spark, df(e1), path, compact = false)
    val r1 = Dedup.postingDeltaRatio(path)
    assert(r1 > 0.0, "first append leaves a measurable delta")
    val thr = r1 * 1.4
    assert(!Dedup.maybeCompactPostingIndex(spark, path, ratio = thr),
      "below the ratio the policy must NOT fold")
    assert(new java.io.File(s"$path/delta/postings").exists())
    Dedup.appendToPostingIndex(spark, df(e2), path, compact = false)
    assert(Dedup.postingDeltaRatio(path) > thr, "second append crosses the bar")
    assert(Dedup.maybeCompactPostingIndex(spark, path, ratio = thr),
      "over the ratio the policy folds the delta in")
    assert(!new java.io.File(s"$path/delta").exists(), "delta folded")
    assert(Dedup.postingDeltaRatio(path) == 0.0, "ratio resets after the fold")
    // and the full loop with the encoded cadence produces exactly the
    // compact-every-append loop's verdicts (fold timing is invisible)
    val all = df(base ++ e1 ++ e2 ++ e3)
    def loop(p: String, perAppend: Boolean, auto: Option[Double]) = {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      Dedup.ingestEpochsLoopOn(spark, all, p, Seq(100L, 200L, 300L),
        compactPerAppend = perAppend, autoCompactRatio = auto)
        .collect().toSeq
    }
    val auto = loop("target/scratch/ingest_auto_l1", perAppend = false, Some(thr))
    val eager = loop("target/scratch/ingest_auto_l2", perAppend = true, None)
    assert(auto == eager, s"auto=$auto eager=$eager")
  }

  test("epoch admits are selected by semi-join, never an In-list of doc ids") {
    import spark.implicits._
    // the round-5 hazard: ingestEpochsOn used to rebuild the admitted
    // batch as col("doc_id").isin(<N literals>) — driver-side plan
    // bloat at production batch sizes. Pin the replacement shape.
    val all = Seq(0L -> "a", 1L -> "b", 2L -> "c").toDF("doc_id", "text")
    val verdicts = Seq((0L, false, false, true), (1L, true, false, false),
        (2L, false, true, false))
      .toDF("doc_id", "exact_dup", "near_dup", "admit")
    val batch = Dedup.admittedBatch(all, verdicts)
    assert(batch.collect().map(_.getLong(0)).toSet == Set(0L))
    val plan = batch.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-join:\n$plan")
    assert(!plan.contains(" IN (") && !plan.contains("In(doc_id"),
      s"In-expression of doc ids crept back into the admitted-batch plan:\n$plan")
  }

  test("sorted neighborhood: shared-prefix near-dups found, sorted-apart dups missed") {
    import spark.implicits._
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha alpha alpha $body x1"),  // same 3-token prefix ->
      (1L, s"alpha alpha alpha $body x2"),  // adjacent after the sort
      (2L, s"beta beta beta $body y1"),     // near-dup of 3 but its...
      (3L, s"zeta zeta zeta $body y1"),     // ...prefix sorts far away
      (5L, "gamma gamma gamma only filler words one"),
      (6L, "omega omega omega only filler words two"),
      (4L, "unrelated words entirely different content here"))
      .toDF("doc_id", "text")
    val got = pairSet(Dedup.sortedNeighborhoodPairsOn(docs))
    assert(got.contains((0L, 1L)), s"prefix-adjacent near-dup missed: $got")
    // the structural blind spot: 2 and 3 share almost all tokens but
    // their blocking keys sort them out of each other's window
    assert(!got.contains((2L, 3L)) && !got.contains((3L, 2L)),
      s"sorted-apart pair should be invisible to SNM: $got")
  }

  test("span dedup: an exact duplicate pair is fully covered") {
    import spark.implicits._
    val text = (1 to 25).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text), (2L, (1 to 25).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.spanDupStatsOn(docs, k = 16, minDocs = 2L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(0L) == ((1.0, false)) && got(1L) == ((1.0, false)))
    assert(got(2L) == ((0.0, true)))
  }

  /** Deterministic content-varied text (letters from fmix64 of the
    * index) so gear boundaries actually occur. */
  private def cdcText(n: Int, seed: Long): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val h = graft.functions.TextExpressions.fmix64(seed * 1000003L + i)
      sb.append((('a' + ((h & 0x7fffffffL) % 26)).toChar))
      i += 1
    }
    sb.toString
  }

  test("cdc chunks: partition invariants (lengths tile the doc, clamps hold)") {
    import spark.implicits._
    val t = cdcText(1500, seed = 7L)
    val rows = Seq((0L, t), (1L, ""), (2L, "x")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.textFunctions
        .cdc_chunk_hashes(col("text"), 6, 16, 256).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    val lens = rows(0L).map(_.getLong(1))
    assert(lens.sum == 1500, "chunk lengths must tile the document exactly")
    assert(lens.init.forall(l => l >= 16 && l <= 256),
      s"every non-final chunk respects [minLen, maxLen]: ${lens.toList}")
    assert(lens.last <= 256)
    assert(lens.length > 3, "a 1500-char varied doc should cut several chunks")
    assert(rows(1L).isEmpty, "empty string chunks to an empty array")
    assert(rows(2L).map(_.getLong(1)) == Seq(1L), "a 1-char doc is one 1-char chunk")
  }

  test("cdc chunks: boundaries re-sync after a head insertion (shift robustness)") {
    import spark.implicits._
    val t = cdcText(1200, seed = 11L)
    // docB = docA with 17 chars INSERTED at the head: every fixed-offset
    // block shifts, but gear boundaries depend only on the trailing
    // 64 chars, so cuts re-align within ~64+maxLen chars of the edit and
    // all downstream chunks hash identically
    val docs = Seq((0L, t), (1L, "INSERTED-PREFIX-" + t), (2L, cdcText(1200, seed = 13L)))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkStatsOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(0L)._1 > 0.6, s"original keeps most chunks shared, got ${got(0L)._1}")
    assert(got(1L)._1 > 0.6, s"shifted copy re-syncs, got ${got(1L)._1}")
    assert(got(2L)._1 == 0.0, "unrelated doc shares nothing")
    assert(!got(0L)._2 && !got(1L)._2 && got(2L)._2)
  }

  test("cdc chunks: within-doc repeats alone never mark duplication") {
    import spark.implicits._
    val phrase = cdcText(300, seed = 3L)
    val docs = Seq((0L, phrase + phrase + phrase), (1L, cdcText(600, seed = 5L)))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkStatsOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(0L) == 0L, "repeated chunks inside ONE doc are not cross-doc dups")
  }

  test("cdc chunks: exact duplicate docs are fully covered") {
    import spark.implicits._
    val t = cdcText(800, seed = 21L)
    val docs = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
    val got = Dedup.cdcChunkStatsOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(0L) == ((1.0, false)) && got(1L) == ((1.0, false)))
  }

  test("cdc pairs: shift-robust coverage pairs a head-inserted near-copy") {
    import spark.implicits._
    val t = cdcText(1200, seed = 31L)
    val docs = Seq(
      (0L, t),
      (1L, "INSERTED-PREFIX-" + t), // shifted near-copy of 0
      (2L, cdcText(1200, seed = 37L)), // unrelated
      (3L, t.substring(0, 400))) // short prefix piece of 0
      .toDF("doc_id", "text")
    val got = Dedup.cdcCoverPairsOn(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.contains((0L, 1L)), s"shifted copy must pair with original: $got")
    val (covA, covB) = got((0L, 1L))
    assert(covA > 0.6 && covB > 0.6,
      s"both sides mostly covered after boundary re-sync: $covA/$covB")
    assert(!got.keys.exists { case (a, b) => a == 2L || b == 2L },
      "unrelated doc pairs with nothing")
    // containment asymmetry: if the 400-char piece shares whole chunks
    // with the original, its OWN side's coverage dominates the long
    // side's (cov on the short side >= cov on the long side)
    got.get((0L, 3L)).foreach { case (cLong, cShort) =>
      assert(cShort >= cLong, s"short-side coverage dominates: $cLong vs $cShort")
    }
  }

  test("dedup rate by source: global keeper rule charges the later copy's source") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dsrc").toString
    Seq(
      (0L, "a b c", "crawlA"), (1L, "a b c", "crawlA"), // dup inside A
      (2L, "d e f", "crawlA"),
      (3L, "a b c", "crawlB"), // cross-source copy → charged to B
      (4L, "g h i", "crawlB"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.dedupRateBySource(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("crawlA") == ((3L, 1L, 0.3333)), s"${got("crawlA")}")
    assert(got("crawlB") == ((2L, 1L, 0.5)), s"${got("crawlB")}")
  }

  test("family agreement: exact matrix on constructed pair sets") {
    import spark.implicits._
    val a = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("doc_a", "doc_b")
    val b = Seq((1L, 2L), (2L, 4L)).toDF("doc_a", "doc_b")
    val c = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.familyAgreementOn(Seq("fa" -> a, "fb" -> b, "fc" -> c))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got(("fa", "fb")) == ((3L, 2L, 2L, 0.6667)), s"${got(("fa", "fb"))}")
    assert(got(("fa", "fc")) == ((3L, 0L, 0L, 0.0)))
    // empty ∩ empty: the 0-denominator guard, not NaN
    assert(got(("fb", "fc")) == ((2L, 0L, 0L, 0.0)))
    assert(got.size == 3)
  }

  test("family agreement on testdata: legs match their standalone generators") {
    val m = Dedup.familyAgreement(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val nJac = Dedup.jaccardPairs(spark, dir).count()
    val nCdc = Dedup.cdcCoverPairs(spark, dir, threshold = 0.8).count()
    // the matrix's per-family volumes are the standalone generators'
    assert(m(("cdc_coverage", "jaccard")) == ((nCdc, nJac)))
    // alphabetical orientation: every row has fam_a < fam_b
    assert(m.keys.forall { case (x, y) => x < y })
  }

  test("cdc pairs: within-doc repeats alone never produce a self pair") {
    import spark.implicits._
    val phrase = cdcText(300, seed = 41L)
    val docs = Seq((0L, phrase + phrase + phrase), (1L, cdcText(900, seed = 43L)))
      .toDF("doc_id", "text")
    assert(Dedup.cdcCoverPairsOn(docs, threshold = 0.1).count() == 0L,
      "repeats inside one doc are not pair evidence")
  }
}
