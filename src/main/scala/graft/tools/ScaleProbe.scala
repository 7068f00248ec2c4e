package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicate the sf0.1 tables 10× (shifted keys,
  * so group/join cardinalities scale with the data instead of
  * densifying) into target/scratch, then time representative operators
  * at 1× and 10× and report the runtime ratio. Near-linear ratios are
  * the evidence that the plans scale by data volume, not by blowup —
  * recorded in PLAN_NOTES.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val big = "target/scratch/sf1x"

    def replicate(table: String, keyCols: Map[String, Long]): Unit = {
      val base = graft.Tables(spark, src, table)
      val out = (0 until 10).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$big/$table.parquet")
    }
    // shift entity keys so cardinalities scale 10x (10x users, docs,
    // vectors — not 10x denser groups); --skip-replicate reuses the
    // tables from a previous run
    if (!args.contains("--skip-replicate")) {
      replicate("events", Map("event_id" -> 10000000L, "user_id" -> 1000000L))
      replicate("documents", Map("doc_id" -> 1000000L))
      replicate("embeddings", Map("vec_id" -> 1000000L))
      // dq_checks' FK gate reads these; o_custkey shifts in lockstep
      // with c_custkey so the orphan ratio is scale-invariant
      replicate("customer", Map("c_custkey" -> 10000000L))
      replicate("orders", Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
      replicate("lineitem", Map("l_orderkey" -> 100000000L))
      // pure dims (supplier/nation/region/part) are NOT shifted: the
      // 10x world keeps the same dimension rows, each fact key gaining
      // 10x references (deliberate hub growth for the graph/Q21/Q7
      // probes) — copied unreplicated
      for (dim <- Seq("supplier", "nation", "region", "part"))
        graft.Tables(spark, src, dim).write.mode("overwrite")
          .parquet(s"$big/$dim.parquet")
    }

    def time(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      // warmup once, then min of 2 (bench methodology)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    // non-flag args = probe only those queries (new-row triage;
    // no args = the full representative suite)
    val only = args.filterNot(_.startsWith("--")).toSet
    val queries = Seq(
      "user_first_last",       // scan + single-shuffle agg
      "event_sessions",        // two stacked windows + agg
      "top_users",             // TakeOrderedAndProject
      "asof_purchase_click",   // union + window asof
      "range_join_nearby",     // binned interval join
      "dedup_exact_groups",    // hash groupBy on md5
      "text_quality",          // single-scan HOFs
      "text_fingerprints",     // native winnow kernel
      "dedup_minhash_lsh",     // LSH band join + exact verify
      "ann_brute_topk",        // broadcast query set x corpus scan
      "text_repetition",       // (doc, token) shuffle + per-row HOF
      "pipeline_contamination",// corpus grams x broadcast eval grams
      "dedup_simhash_pairs",   // M61+fmix votes, block-pair join
      "dedup_jaccard_pairs",   // hashed posting self-join (native shingles)
      "sketch_kmv_users",      // scan-stage hash + bounded top-k merge
      "doc_chunks",            // per-row generate, no shuffle
      "vocab_oov_rate",        // top-V induction + broadcast score join
      "mixture_balance",       // count-derived rates broadcast to scan
      "embedding_cluster_assign", // k-seed broadcast assignment pass
      "text_pii_scrub",        // per-row regexp kernels, zero shuffle
      "pipeline_line_dedup",   // line-hash df groupBy + flag join + regroup
      "corpus_shuffle_order",  // range exchange + two-phase rank
      "pipeline_dedup_keep_best", // pair-graph clusters + argmax window
      "pipeline_contamination_bloom", // bloom prefilter + broadcast confirm
      "bm25_topk",             // tf groupBy + broadcast query terms
      "text_lm_surprisal",     // tf groupBy + vocab-sized LM join
      "text_pmi_pairs",        // per-row pair generate + pair groupBy
      "embedding_semantic_dedup", // per-cell pairwise prune
      "sample_split_assign",   // scan-stage md5 bucket routing
      "dedup_span_stats",      // span-hash postings, 2 hash shuffles
      "text_lm_bigram",        // per-row bigram gen + vocab^2 count join
      "funnel_conversion",     // chained user-keyed joins + min-aggs
      "cohort_retention",      // first-day agg + join back + count
      "session_window_stats",  // native merge-on-overlap sessions
      "daily_error_rate",      // daily agg + range frame over days
      "trailing_hour_value",   // per-user RANGE frame over event time
      "dedup_fuzzy_pairs",     // posting candidates + bounded edit dist
      "dedup_ingest_verdicts", // hash semi-join + cross-side jaccard
      "pipeline_quality_ensemble", // four signal lineages, doc-keyed joins
      "source_mixture",        // groupBy + broadcast total
      "sample_docs_weighted",  // scan-stage keys + TakeOrdered
      "dq_profile_events",     // one agg pass, multi-distinct Expand
      "dq_checks",             // five aggregate/anti-join gates
      "dedup_ingest_indexed",  // persisted index build + pruned batch reads
      "bm25_topk_pruned",      // rare-term candidate prune + exact rescore
      "media_features",        // batched mapPartitions decode kernels
      "supplier_pagerank",     // 5 join+agg rounds over the edge list
      "heavy_hitter_event_types", // MG mapPartitions + candidate recount
      "returned_item_suppliers",  // three-pass per-order aggregates
      "user_value_ewma",       // per-user ordered collect + HOF fold
      "user_stats_incremental", // state write + per-key outer merge
      "user_enrich_salted",    // salted join (dim replicated 8x)
      "lang_token_stats",      // explode + per-lang distinct agg
      "supplier_reach_hops",   // 4 BFS relaxation rounds
      "hybrid_topk_rrf",       // two retriever lineages + rank fusion
      "ann_lsh_topk",          // hash-sign buckets + exact rescore
      "embedding_neardup_pairs", // LSH self-join + exact verify
      "ann_ivf_topk",          // decimal-mean Lloyd + probed rescore
      "late_shipment_orders",  // EXISTS semi-join, non-equi conjunct
      "nation_pair_trade",     // fact-fact join + 4 broadcast dims
      "dormant_customer_balance") // scalar threshold + anti-join
    println("query,t1x_sec,t10x_sec,ratio")
    for (q <- queries if only.isEmpty || only(q)) {
      val t1 = time(q, src)
      val t10 = time(q, big)
      println(f"SCALE $q,$t1%.2f,$t10%.2f,${t10 / t1}%.1f")
    }
    spark.stop()
  }
}
