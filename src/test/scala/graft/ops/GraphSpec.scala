package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank semantics on a planted star graph, cross-checked against
  * a local power iteration applying the IDENTICAL 9dp-decimal
  * rounding recipe — so the distributed plan must reproduce the
  * scalar reference bit-for-bit, not just approximately. */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Hub 0 connected to spokes 1..6, plus an off-hub edge 1-2. */
  private def starEdges = {
    import spark.implicits._
    val und = (1 to 6).map(i => (0L, i.toLong)) :+ (1L, 2L)
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  private def round9(x: Double): BigDecimal =
    BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  /** Scalar power iteration with the same per-term rounding. */
  private def reference(und: Seq[(Long, Long)], iters: Int): Map[Long, BigDecimal] = {
    val edges = und ++ und.map(_.swap)
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = out.keySet
    val n = nodes.size
    var p: Map[Long, BigDecimal] = nodes.map(_ -> round9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _) => round9(p(u).toDouble / out(u).toDouble) }.sum
      }.toMap
      p = nodes.map { v =>
        // (1.0 - 0.85) is NOT the double 0.15 — match the library's op
        v -> round9((1.0 - 0.85) / n + 0.85 * sums.getOrElse(v, BigDecimal(0)).toDouble)
      }.toMap
    }
    p
  }

  test("distributed ranks equal the scalar 9dp reference bit-for-bit") {
    val und = (1 to 6).map(i => (0L, i.toLong)) :+ (1L, 2L)
    val got = Graph.pageRank(starEdges, iterations = 5).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val want = reference(und, 5)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(got(k) == v, s"node $k: got ${got(k)} want $v")
  }

  test("shortestHops: path-graph distances, horizon cap, unreachable absent") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7 plus isolated pair 10-11
    val und = (1L to 6L).map(i => (i, i + 1)) :+ (10L, 11L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seed = Seq(1L).toDF("node")
    val got = Graph.shortestHops(edges, seed, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nodes 1..5 at hops 0..4; 6,7 beyond horizon; 10,11 unreachable
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L), s"$got")
  }

  test("shortestHops caches only the final distance frame, even at long horizons") {
    import spark.implicits._
    val und = (1L to 12L).map(i => (i, i + 1))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seed = Seq(1L).toDF("node")
    val before = spark.sparkContext.getPersistentRDDs.size
    val dist = Graph.shortestHops(edges, seed, maxHops = 10)
    // superseded per-round frames AND the edge cache are released;
    // only the returned (materialized) dist remains
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"cached RDDs grew $before -> $after over a 10-hop horizon")
    val got = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 11L).map(i => i -> (i - 1)).toMap, s"$got")
    dist.unpersist()
  }

  test("rank mass stays ~1 and the hub dominates") {
    val ranks = Graph.pageRank(starEdges, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"rank mass ${ranks.values.sum}")
    val hub = ranks(0L)
    assert((1L to 6L).forall(ranks(_) < hub), s"hub not dominant: $ranks")
    // spokes 1 and 2 share the extra edge and must outrank 3..6
    assert((3L to 6L).forall(i => ranks(i) < ranks(1L) && ranks(i) < ranks(2L)))
  }

  private def triRow(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
    import spark.implicits._
    val r = Graph.triangleStats(edges.toDF("u", "v")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("triangle census: K4 is fully transitive") {
    // complete graph on 4 nodes: C(4,3)=4 triangles, 6 edges, every
    // node's wedge count C(3,2)=3 → 12 wedges, transitivity 3*4/12 = 1
    val k4 = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    assert(triRow(k4) == ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("triangle census: a star closes nothing") {
    // hub 0 with 5 spokes: wedges C(5,2)=10 at the hub, zero triangles.
    // Also the orientation stress case: the hub is π-maximal, so wedge
    // enumeration from out-neighbors must generate NO candidate pairs
    // at the hub itself.
    val star = (1L to 5L).map(i => (0L, i))
    assert(triRow(star) == ((6L, 5L, 10L, 0L, 0.0)))
  }

  test("triangle census: one closed plus one open wedge") {
    // triangle 0-1-2 plus pendant 2-3: 1 triangle; degrees 2,2,3,1 →
    // wedges 1+1+3+0 = 5; transitivity 3/5 = 0.6
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    assert(triRow(g) == ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("link prediction: the two ends of a path are the perfect candidate") {
    import spark.implicits._
    // path 1-2-3 plus pendant 3-4: candidates (1,3) via common
    // neighbor 2 (score 1/(1+2-1) = 0.5), (2,4) via 3 (score
    // 1/(2+1-1) = 0.5), (1,4)/(2,3)... (1,4) share no neighbor, (2,3)
    // are adjacent. Square 10-11-12-13(-10): (10,12) and (11,13) each
    // share BOTH neighbors → score 2/(2+2-2) = 1.0, ranked first.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L)).toDF("u", "v")
    val got = Graph.linkPredictionOn(edges, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.take(2).toSeq == Seq((10L, 12L, 2L, 1.0), (11L, 13L, 2L, 1.0)),
      s"${got.toSeq}")
    assert(got.drop(2).toSet == Set((1L, 3L, 1L, 0.5), (2L, 4L, 1L, 0.5)),
      s"${got.toSeq}")
    assert(got.length == 4, "adjacent pairs and no-common-neighbor pairs excluded")
  }

  test("oriented triangle count agrees with a naive count on real co-occurrence") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val e = li.as("a").join(li.as("b"), "ok")
      .filter(col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
      .persist()
    val fast = Graph.triangleStats(e).collect().head.getLong(3)
    val e1 = e.select(col("u").as("a"), col("v").as("b"))
    val e2 = e.select(col("u").as("b"), col("v").as("c"))
    val e3 = e.select(col("u").as("a"), col("v").as("c"))
    val naive = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
    e.unpersist(blocking = false)
    assert(fast == naive && fast > 0, s"fast=$fast naive=$naive")
  }

  test("supplier components: planted strong ties split into labeled, sized components") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graph").toString
    // strong ties: (1,2), (2,3), (4,5) each share TWO orders; 30
    // background pairs share one order each, so the p90 of the
    // pair-count distribution sits at 1 and only the planted ties
    // pass the c > p90 gate. Expected components: {1,2,3} and {4,5}.
    val strong = Seq((1L, Seq(1L, 2L)), (2L, Seq(1L, 2L)),
      (3L, Seq(2L, 3L)), (4L, Seq(2L, 3L)), (5L, Seq(4L, 5L)), (6L, Seq(4L, 5L)))
    val background = (0 until 30).map(i =>
      (1000L + i, Seq(100L + 2 * i, 101L + 2 * i)))
    (strong ++ background)
      .flatMap { case (ok, sks) => sks.map(sk => (ok, sk)) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.supplierComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L)), s"${got.toSeq}")
  }

  test("LPA: a barbell splits into its two triangles across the bridge") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4: one
    // connected component, but LPA's majority vote never lets either
    // triangle's label cross the bridge (hand-traced: round 1 seeds
    // 1 and 3→min-tie, round 2 settles {1,2,3}→1 and {4,5,6}→4,
    // rounds 3-4 are stable)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"$got")
  }

  /** Classic sequential peeling — the independent scalar reference:
    * repeatedly remove a minimum-degree node; a node's coreness is the
    * highest minimum degree seen up to its removal. */
  private def peelCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val (node, nbrs) = adj.minBy { case (n, ns) => (ns.size, n) }
      k = math.max(k, nbrs.size.toLong)
      core(node) = k
      adj.remove(node)
      nbrs.foreach(n => adj.get(n).foreach(_ -= node))
    }
    core.toMap
  }

  test("coreness: K4 with a pendant — 3-core plus a degree-1 tail") {
    import spark.implicits._
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 :+ (4L, 5L)).toDF("u", "v")
    val got = Graph.corenessHIndex(edges, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L), s"$got")
  }

  test("coreness: h-index fixpoint equals sequential peeling on the real graph") {
    val edges = Graph.strongTieEdges(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = peelCoreness(edges)
    import spark.implicits._
    val got = Graph.corenessHIndex(edges.toDF("u", "v"), rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("coreness: 12 rounds is the fixpoint at the gate scale (12 = 16 at sf0.01)") {
    // sf0.01 is the deepest peel on the testdata surface (10 rounds;
    // sf0.1 needs only 9 — depth tracks the peel structure, not size)
    val e = Graph.strongTieEdges(spark, "/root/testdata/sf0.01")
      .persist()
    val at12 = Graph.corenessHIndex(e, rounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val at16 = Graph.corenessHIndex(e, rounds = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(at12 == at16, "h-index iteration had not converged by round 12")
  }

  test("bucketed ranks equal the scalar 9dp reference bit-for-bit") {
    val und = (1 to 6).map(i => (0L, i.toLong)) :+ (1L, 2L)
    val got = Graph.pageRankBucketed(spark, starEdges, iterations = 5)
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val want = reference(und, 5)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(got(k) == v, s"node $k: got ${got(k)} want $v")
  }

  test("bucketed layout is landed once per session and reused across invocations") {
    val first = Graph.pageRankBucketed(spark, starEdges, iterations = 3)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val afterFirst = Graph.layoutCacheSize(spark)
    // ≥ 1: an earlier test over the same semantic edges may already
    // have landed it — which is itself the cache doing its job
    assert(afterFirst >= 1, "an invocation should have landed a layout")
    spark.catalog.clearCache() // the between-queries contract
    val second = Graph.pageRankBucketed(spark, starEdges, iterations = 3)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(Graph.layoutCacheSize(spark) == afterFirst,
      "semantically identical edges re-landed the layout instead of reusing it")
    assert(second == first, "reused layout changed the result")
    // the cached layout dir is registered live (Bench's sweep must skip it)
    assert(Graph.liveLayoutDirNames.nonEmpty)
  }

  test("layout cache: hit survives GC of the weakly-held verification plan") {
    // The cache holds its sameResult-verification plan only weakly (a
    // strongly-held analyzed plan references the SparkSession through
    // HadoopFsRelation, which would defeat the WeakHashMap's session
    // eviction). A cleared ref must fall back to the canonical-string
    // check and still HIT — not silently re-land the layout, which
    // would regress the amortized path every time GC runs.
    val first = Graph.pageRankBucketed(spark, starEdges, iterations = 3)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val size = Graph.layoutCacheSize(spark)
    assert(size >= 1)
    Graph.clearLayoutPlanRefs(spark) // simulate GC collecting every plan ref
    spark.catalog.clearCache()
    val second = Graph.pageRankBucketed(spark, starEdges, iterations = 3)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(Graph.layoutCacheSize(spark) == size,
      "cleared plan refs re-landed the layout instead of hitting via the canonical string")
    assert(second == first, "canonical-string fallback hit changed the result")
  }

  test("bucketed round: exactly ONE shuffle exchange — both joins co-partitioned") {
    // The claim the bucketed layout exists to make checkable: with
    // edges bucketed by src and deg/p inheriting that partitioning,
    // a round's contribution join and update join plan with no
    // ShuffleExchange; the lone remaining exchange is the groupBy(dst)
    // message aggregation (the information-theoretic floor — rank
    // mass crosses partitions along edges no matter the layout).
    // The unbucketed prose baseline is three exchanges per round.
    val (e, deg, dropLayout) = Graph.prBucketedOperands(spark, starEdges, buckets = 4)
    try {
      val p0 = deg.select(col("node"), col("outdeg"), col("n_total"),
        round(lit(1.0) / col("n_total").cast("double"), 9)
          .cast("decimal(20,9)").as("rank"))
      val stepped = Graph.prRound(p0, e, deg)
      stepped.collect() // materialize so AQE's final plan is inspectable
      // Count ShuffleExchangeExec in the EXECUTED round: descend
      // through AQE wrappers and query stages, but not into cached
      // relations (deg is built once, outside the loop) and not into
      // the pre-AQE "initial plan" (string matching would count both).
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def countShuffles(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
        val kids: Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _: InMemoryTableScanExec => Nil
          case other => other.children
        }
        self + kids.map(countShuffles).sum
      }
      val shuffles = countShuffles(stepped.queryExecution.executedPlan)
      assert(shuffles == 1,
        s"expected exactly 1 shuffle exchange in the round, got $shuffles:\n" +
          stepped.queryExecution.executedPlan)
    } finally { deg.unpersist(blocking = false); dropLayout() }
  }

  test("plain persist-loop round: ONE exchange too — co-partitioning survives the cache") {
    // Round-10 consequence of porting the plain loop onto prLoop: the
    // InMemoryTableScans preserve hash(src)/hash(node) partitioning, so
    // WITHIN a session the plain round co-partitions both joins exactly
    // like the bucketed one — the lone exchange is the groupBy(dst)
    // message aggregation (the floor). The bucketed layout's remaining
    // distinct value is CROSS-JOB persistence: a new session reuses the
    // disk layout where the plain operands must re-shuffle once.
    val e = starEdges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    val degBase = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val nTotal = degBase.agg(count(lit(1)).as("n_total"))
    val deg = degBase.crossJoin(broadcast(nTotal))
      .repartition(col("node")).persist()
    try {
      val p0 = deg.select(col("node"), col("outdeg"), col("n_total"),
        round(lit(1.0) / col("n_total").cast("double"), 9)
          .cast("decimal(20,9)").as("rank"))
      val stepped = Graph.prRound(p0, e, deg)
      stepped.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def countShuffles(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
        val kids: Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _: InMemoryTableScanExec => Nil
          case other => other.children
        }
        self + kids.map(countShuffles).sum
      }
      val shuffles = countShuffles(stepped.queryExecution.executedPlan)
      assert(shuffles == 1,
        s"expected exactly 1 shuffle in the plain persist-loop round, got $shuffles:\n" +
          stepped.queryExecution.executedPlan)
    } finally {
      e.unpersist(blocking = false); deg.unpersist(blocking = false)
    }
  }

  /** The round-13 size-gated local solves must be BIT-IDENTICAL to
    * the distributed loops they shortcut (the clustersFromEdges
    * precedent): run each operator twice on the sf0.001 trade graph —
    * once through the gate (local path fires; the graph is far under
    * the budget) and once with localGate = 0 (distributed forced) —
    * and require row-set equality including the decimal rank values. */
  test("pageRank local path ≡ distributed loop, bit-for-bit") {
    val e = Graph.tradeEdges(spark, "/root/testdata/sf0.001")
    val local = Graph.pageRank(e, iterations = 5).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val dist = Graph.pageRank(e, iterations = 5, localGate = 0L).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(local == dist)
    spark.catalog.clearCache()
  }

  test("kcore/LPA/hops local paths ≡ distributed loops") {
    import spark.implicits._
    val te = Graph.tradeEdges(spark, "/root/testdata/sf0.001")
    val und = te.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(Graph.corenessHIndex(und, rounds = 8)) ==
      rows(Graph.corenessHIndex(und, rounds = 8, localGate = 0L)))
    assert(rows(Graph.labelPropagation(und, rounds = 4)) ==
      rows(Graph.labelPropagation(und, rounds = 4, localGate = 0L)))
    val seed = Seq(1L).toDF("node")
    assert(rows(Graph.shortestHops(te, seed, maxHops = 4)) ==
      rows(Graph.shortestHops(te, seed, maxHops = 4, localGate = 0L)))
    spark.catalog.clearCache()
  }

  test("LPA refines components: no community ever crosses a component") {
    val dir = "/root/testdata/sf0.001"
    val comp = Graph.supplierComponents(spark, dir)
      .select(col("s_suppkey"), col("component"))
    val comm = Graph.supplierCommunitiesLpa(spark, dir)
      .select(col("s_suppkey"), col("community"))
    val crossings = comm.join(comp, "s_suppkey")
      .groupBy(col("community"))
      .agg(countDistinct(col("component")).as("nc"))
      .filter(col("nc") > 1)
      .count()
    assert(crossings == 0L, "a label propagated across a component boundary")
  }
}
