package graft

/** Executable scale-posture checks: the physical plans we rely on at 100 TB
  * are asserted, not assumed — filters reach the parquet scan, projections
  * prune the read schema, dimension joins broadcast, aggregations are
  * partial+final, top-k avoids a global sort.
  */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q03 filter pushes predicates into the parquet scan") {
    val p = plan("q03_filter_predicates")
    assert(p.contains("PushedFilters: ["), p)
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "pushed filter list should be non-empty\n" + p)
  }

  test("q02 projection prunes the read schema") {
    val p = plan("q02_project_cast")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_returnflag"), "unreferenced column must not be read\n" + p)
    assert(!p.contains("l_shipdate"), "unreferenced column must not be read\n" + p)
  }

  test("q15 flagship broadcasts all three dimension tables") {
    val p = plan("q15_flagship_revenue")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast joins, saw $n\n" + p)
  }

  test("q11 aggregation is partial+final (map-side combine)") {
    val p = plan("q11_agg_tpch_q1")
    assert(p.contains("partial_"), "expected partial aggregation\n" + p)
  }

  test("q21 ordered limit plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q21_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q96 rank filter plans WindowGroupLimit (per-group heap, not full sort)") {
    val p = plan("q96_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q98 binned range join avoids nested-loop and cartesian plans") {
    val p = plan("q98_range_join")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q100 scd2 history shuffles exactly once on the pk") {
    val p = plan("q100_cdc_scd2_history")
    val hashEx = "Exchange hashpartitioning\\(pk".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one pk hash exchange, saw $hashEx\n" + p)
  }

  test("q105 vocab lookup broadcasts; the token stream never sort-merge joins") {
    val p = plan("q105_vocab_apply")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q109 lateral LIMIT decorrelates to WindowGroupLimit, not a nested loop") {
    val p = plan("q109_lateral_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q110 naive BETWEEN join is rewritten by RangeJoinRule (no nested loop)") {
    val p = plan("q110_range_join_auto")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q33 latest-image merge shuffles exactly once on the pk") {
    val p = plan("q33_cdc_latest_image")
    val hashEx = "Exchange hashpartitioning\\(pk".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one pk hash exchange, saw $hashEx\n" + p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q35 routing predicates stay codegen-compatible (no UDF in plan)") {
    val p = plan("q35_cdc_route_multicast")
    // Spark 4.1 renders ScalaUDF nodes as "UDF(" in plan strings
    assert(!p.contains("BatchEvalPython") && !p.contains("UDF("), p)
  }

  test("q41 jaccard candidate join keeps its equi key (length filter rides along)") {
    // The AllPairs length filter adds inequality conditions to the prefix
    // join; they must remain ancillary predicates on the shingle equi-join,
    // never degrade it to a nested-loop/cartesian plan.
    val p = plan("q41_dedup_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi join\n" + p)
  }

  test("q75 raw row decode runs codegen'd with only the declared fixture-encode UDF") {
    // Count actual ScalaUDF nodes in the optimized plan (the plan STRING
    // renders one node several times under AQE): exactly the one
    // fixture-synthesis encode UDF; the decode itself is an expression.
    val qe = SparkEntry.queries("q75_binlog_rows_write")(spark, dir).queryExecution
    val udfs = qe.optimizedPlan.flatMap(n => n.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })).length
    assert(udfs == 1, s"expected exactly the fixture encode UDF, saw $udfs")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }

  test("q52 exact cosine pairs run distributed: no broadcast, no cartesian") {
    val p = plan("q52_dedup_embedding")
    assert(!p.contains("BroadcastExchange"),
      "exact near-dup must not broadcast the data table\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "exact near-dup must not plan an all-to-all join\n" + p)
    assert(p.contains("Exchange hashpartitioning"),
      "block-pair tasks should come from one hash shuffle\n" + p)
  }

  test("asof join costs exactly one key shuffle, like a single window query") {
    import org.apache.spark.sql.functions._
    val e = Tables(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    val p = operators.AsofJoin
      .asofJoin(clicks, views, Seq("user_id"), "ts", "ts", Seq("view_value"))
      .queryExecution.executedPlan.toString
    val keyEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(keyEx <= 2, s"one exchange per union branch at most, saw $keyEx\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "asof must be a window computation, not a join explosion\n" + p)
  }

  test("q121 keywords: one fact shuffle reused by tf agg + window, df broadcasts") {
    val p = plan("q121_keywords_tf_df")
    // the explicit doc_id repartition must be the ONLY hash exchange on
    // the fact path: groupBy(doc_id, token) and the per-doc window both
    // reuse it (subset-clustering satisfaction); df flows back broadcast
    val factEx = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length
    assert(factEx == 1, s"expected exactly one doc_id exchange, saw $factEx\n" + p)
    // (the df branch's token exchange carries partial-agg vocab-sized
    // rows — that one is expected and cheap)
    assert(p.contains("BroadcastHashJoin"), "df lookup should broadcast\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "the fact stream must not sort-merge for the df join\n" + p)
    assert(p.contains("WindowGroupLimit"),
      "rank<=3 should push below the window sort\n" + p)
  }

  test("q122 familiarity: count lookup is a key-shuffle join, never all-to-all") {
    val p = plan("q122_quality_familiarity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bigram count join must stay keyed\n" + p)
    assert(p.contains("Exchange hashpartitioning(bg"),
      "the count join shuffles on the bigram key (the non-broadcastable-vocab shape)\n" + p)
  }

  test("q82 stratified sample: rate lookup broadcasts, fact side never shuffles") {
    val p = plan("q82_sample_stratified")
    // The orderBy in the query adds a range exchange for determinism; the
    // JOIN itself must be broadcast — no hash exchange of documents.
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "documents must not hash-shuffle for the rate lookup\n" + p)
  }

  test("q127 txn assembly: windows reuse the fixture agg's gid shuffle, no join") {
    val p = plan("q127_binlog_txn_assembly")
    assert(!p.contains("Join"),
      "XID stamping must be the forward window, not a self-join (which " +
        "would recompute the upstream on both sides)\n" + p)
    // the agg exchanges on the grouping expression; both windows then
    // reuse that partitioning (gid is its alias) — one shuffle total
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1,
      s"expected exactly one hash exchange (agg + both windows share it), " +
        s"saw $n\n" + p)
  }

  test("q130 executed-set: islands window is bucketed, never sid-only over gnos") {
    val p = plan("q130_gtid_executed_set")
    // level 1 must partition by (sid, bucket) — a sid-only sort of the gno
    // stream would put one server identity's entire history on one reducer
    assert(p.contains("hashpartitioning(sid") && p.contains("__bucket"),
      "level-1 islands must key on (sid, __bucket)\n" + p)
    assert(!p.contains("SinglePartition"),
      "no stage of the set collapse may serialize to one partition\n" + p)
  }

  test("q131 resume skip: applied set broadcasts, replay side never shuffles for it") {
    val p = plan("q131_gtid_resume_skip")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "interval skip must be a broadcast anti join\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the replayed stream must not shuffle against interval metadata\n" + p)
    // the gno bin must be a HASH KEY of the (narrow-interval) anti join,
    // not merely a residual in its condition: keying on sid alone scans
    // every interval of that sid per probe row. Checked inside the join's
    // key bracket, so a regression to residual-only still fails.
    assert("""BroadcastHashJoin \[[^\]]*__bin""".r.findFirstIn(p).isDefined,
      "anti join must equi-key on (sid, __bin), not sid alone\n" + p)
  }

  test("q136 partial JSON decode is a pure per-row pipeline: zero exchanges") {
    val p = plan("q136_binlog_json_partial")
    assert(!p.contains("Exchange"),
      "encode -> split -> decode -> project must fuse over the scan with " +
        "no shuffle anywhere\n" + p)
  }

  test("q134 rows-query attribution: one shuffle shared by agg and window") {
    val p = plan("q134_binlog_rows_query")
    assert(!p.contains("Join"),
      "statement pairing must be the running-last window, not a join\n" + p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1,
      s"expected exactly one hash exchange (fixture agg + window share " +
        s"the gid key), saw $n\n" + p)
  }

  test("q140 evolved snapshot: windows and keyed unions, never nested-loop") {
    val p = plan("q140_evolved_snapshot")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of pairing and the pk merge must stay keyed windows\n" + p)
  }

  test("q141 truncate merge: the truncate position broadcasts as a scalar") {
    val p = plan("q141_truncate_merge")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 1-row truncate max must broadcast to the stream side\n" + p)
    assert(!p.contains("CartesianProduct"),
      "the stream side must never materialize a cartesian\n" + p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 2, s"expected at most 2 hash exchanges (pk merge + union " +
      s"prep), saw $n\n" + p)
  }

  test("q150 full-metadata decode: one-row TABLE_MAP broadcasts, zero hash exchange") {
    val p = plan("q150_binlog_full_metadata")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the one-row FULL TABLE_MAP struct must broadcast to the row events\n" + p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 0, s"per-row decode must not shuffle, saw $n hash exchanges\n" + p)
  }

  test("q151 recursive CTE plans Spark's native UnionLoop") {
    val p = plan("q151_recursive_cte")
    assert(p.contains("UnionLoop"), "WITH RECURSIVE must run natively\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q152 quality rules are per-row: no hash exchange before the sort") {
    val p = plan("q152_quality_gopher")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 0, s"rule evaluation must stay per-row, saw $n hash exchanges\n" + p)
  }

  test("q153 bootstrap merge: keyed joins only, bounded pk exchanges") {
    val p = plan("q153_snapshot_bootstrap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "watermark join and merge must stay keyed\n" + p)
    val n = "Exchange hashpartitioning\\(pk".r.findAllIn(p).length
    assert(n <= 4, s"expected at most 4 pk hash exchanges, saw $n\n" + p)
  }

  test("q155 MMR re-rank: queries broadcast, candidates never cartesian with vectors") {
    val p = plan("q155_sim_mmr_rerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the bounded query side must broadcast\n" + p)
  }

  test("q133 schema evolution: DDL fold is metadata-scale, no cartesian") {
    val p = plan("q133_schema_evolution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of joins must stay keyed unions + windows, never nested-loop\n" + p)
    // the version fold aggregates on (db, tbl) — catalog-scale keys
    assert(p.contains("hashpartitioning(db") || p.contains("hashpartitioning(tbl"),
      "DDL fold must group on the table key\n" + p)
  }

  test("q156 LM scoring: pair-level joins keyed on n-grams, never all-to-all") {
    val p = plan("q156_lm_stupid_backoff")
    assert(!p.contains("CartesianProduct"), p)
    // scoring runs at the (doc, trigram) PAIR level — the skew contract
    assert(p.contains("hashpartitioning(doc_id") && p.contains("tri"),
      "scoring must aggregate to (doc, trigram) pairs before joining\n" + p)
    // count lookups are equi-joins on the n-gram key; at fixture scale
    // Catalyst broadcasts the tiny count tables (correct there — at corpus
    // scale stats flip them to shuffle joins on the same keys), so assert
    // the join KEYS, not the exchange kind
    assert("\\[tri#\\d+\\], \\[tri#\\d+\\], LeftOuter".r.findFirstIn(p).isDefined,
      "trigram count lookup must be an equi-join on the n-gram\n" + p)
    assert(p.contains("partial_"), "count aggs must map-side combine\n" + p)
  }

  test("q157 DSIR: the 256-bucket weight table broadcasts, selection is top-k") {
    val p = plan("q157_dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      "the O(256) lambda table must broadcast — DSIR's scale contract\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-k selection must not global-sort\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q159 UniMax: unpartitioned windows run only over the per-language supply agg") {
    val qe = SparkEntry.queries("q159_sample_unimax")(spark, dir).queryExecution
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = qe.optimizedPlan.collect { case w: LWindow => w }
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    assert(unpart.nonEmpty, "expected the metadata-scale allocation window")
    // the water-filling rank/cumsum may be global ONLY above the lang
    // supply aggregate (thousands of rows), never over the docs relation
    unpart.foreach { w =>
      val aggBelow = w.child.collect {
        case a: Aggregate if a.groupingExpressions.exists(_.toString.contains("lang")) => a
      }
      assert(aggBelow.nonEmpty,
        "unpartitioned window must sit above the per-language supply agg, " +
          "not the doc-scale relation\n" + w)
    }
    // the doc-scale token cumsum is partitioned by lang
    assert(wins.exists(w => w.partitionSpec.exists(_.toString.contains("lang"))),
      "doc cumsum window must partition by lang\n" + wins.mkString("\n"))
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin \\[lang".r.findFirstIn(p).isDefined,
      "the O(#langs) allocation table must broadcast back to docs\n" + p)
  }

  test("q160 hard negatives: corpus pruned by broadcast vocab, top-k is a group heap") {
    val p = plan("q160_hard_negatives")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin \\[tok".r.findFirstIn(p).isDefined,
      "the mining batch's vocabulary must broadcast-prune the corpus token stream\n" + p)
    assert(p.contains("WindowGroupLimit"),
      "per-query top-20 must plan a group heap, not a full sort\n" + p)
  }

  test("q161 PII redaction is a pure per-row regex chain: zero hash exchanges") {
    val p = plan("q161_pii_redact")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 0, s"redaction must stay per-row, saw $n hash exchanges\n" + p)
  }

  test("q163 cluster sample: per-row assignment feeds a group-heap window") {
    val p = plan("q163_cluster_sample")
    assert(p.contains("WindowGroupLimit"),
      "per-cluster cap must plan a group heap\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // assignment is codegen'd per-row: the only hash exchange is the
    // window's cluster partitioning
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 1, s"expected at most the cluster window exchange, saw $n\n" + p)
  }

  test("q164 URL dedup: one canonical groupBy, domain cap is a group heap") {
    val p = plan("q164_url_dedup")
    assert(p.contains("WindowGroupLimit"),
      "per-domain cap must plan a group heap\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), "dedup agg must map-side combine\n" + p)
  }

  test("q165 NB classifier: scoring joins on the word key at pair level, no cartesian") {
    val p = plan("q165_nb_quality")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(doc_id") || p.contains("hashpartitioning(w"),
      "scoring must aggregate (doc, word) pairs\n" + p)
    assert(p.contains("partial_"), "count aggs must map-side combine\n" + p)
    assert("\\[w#\\d+\\], \\[w#\\d+\\]".r.findFirstIn(p).isDefined,
      "the lambda lookup must be an equi-join on the word\n" + p)
  }

  test("q166 CCNet buckets: cutoffs broadcast, bucketing per-row — no window, no sort-by-score") {
    val p = plan("q166_ccnet_buckets")
    assert(!p.contains("CartesianProduct"), p)
    // the tercile cutoffs are a 1-row broadcast; bucketing is a comparison,
    // never an ntile window (a global sort at corpus scale)
    assert(!p.contains("WindowExec") && !"Window \\[ntile".r.findFirstIn(p).isDefined,
      "bucketing must not plan a global ntile window\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the two-value cutoff row must broadcast\n" + p)
  }

  test("q167 edit-distance pairs: blocked equi self-join, never all-pairs") {
    val p = plan("q167_editdist_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay blocked on (prefix, length bucket)\n" + p)
    assert("\\[pfx#\\d+, lb#\\d+L?\\]".r.findFirstIn(p).isDefined,
      "the self-join must key on the block\n" + p)
  }

  test("q168 boilerplate strip: hot-prefix set broadcasts back, agg map-side combines") {
    val p = plan("q168_boilerplate_strip")
    assert(p.contains("BroadcastHashJoin"),
      "the boilerplate set is tiny by definition and must broadcast\n" + p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q158 span removal: dup filter is a window, removal an anti-join, no cartesian") {
    val p = plan("q158_dup_span_removal")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("hashpartitioning(gram"),
      "first-occurrence rank must partition by span text\n" + p)
    assert(p.contains("LeftAnti"), "covered positions must anti-join\n" + p)
  }

  test("q171 winnowing is one per-row kernel: no join, no extra exchange") {
    val p = plan("q171_winnow_fingerprint")
    assert(!p.contains("Join"), "fingerprinting must not join\n" + p)
    // explode + final output sort only — no hash exchange before the sort
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q172 shuffle-shard: one shard hash exchange, no global pre-sort") {
    val p = plan("q172_shuffle_shard")
    val hashEx = "Exchange hashpartitioning\\(shard".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one shard hash exchange, saw $hashEx\n" + p)
  }

  test("q173 blocklist screen is pure per-row work: no join, no hash exchange") {
    val p = plan("q173_blocklist_screen")
    assert(!p.contains("Join") && !p.contains("Exchange hashpartitioning"), p)
  }

  test("q175 decontamination broadcasts the eval set, never all-to-all") {
    val p = plan("q175_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the eval set must broadcast\n" + p)
    assert(!p.contains("CartesianProduct"),
      "candidate x eval scoring must not plan a shuffle cartesian\n" + p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q176 XA assembly: outcomes broadcast back, span stamp shares one (file, ord) sort") {
    val p = plan("q176_binlog_xa_txn")
    assert(p.contains("BroadcastHashJoin"),
      "statement-scale outcomes must broadcast\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q181 winnow near-dup joins on the fingerprint hash key, never cartesian") {
    val p = plan("q181_winnow_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("hashpartitioning\\(h#".r.findFirstIn(p).isDefined,
      "the pair join must key on the fingerprint hash\n" + p)
  }

  test("q182 composite pipeline plans without any cartesian or nested loop") {
    val p = plan("q182_pipeline_curation_v2")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), "the dedup drop must anti-join\n" + p)
  }

  test("q185 exact median: per-group windows only, partial+final final agg") {
    val p = plan("q185_exact_median")
    assert(p.contains("partial_"), "the middle-row agg must map-side combine\n" + p)
    assert(!p.contains("SinglePartition"),
      "no window may collapse to one partition\n" + p)
  }

  test("q187 checksum diff: bucket-key aggs both partial, no cartesian") {
    val p = plan("q187_table_checksum_diff")
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q190 apportionment: metadata-scale quota table broadcasts back") {
    val p = plan("q190_split_apportion")
    assert(p.contains("BroadcastHashJoin"),
      "the quota/bounds table is O(langs x splits) and must broadcast\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q191 snapshot diff is one pk-keyed full join, never nested-loop") {
    val p = plan("q191_snapshot_diff")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q200 sampled audit: budget via TakeOrderedAndProject, sample semi-join broadcasts") {
    val p = plan("q200_neardup_signals_sampled")
    // the fixed-size sample is per-partition heaps, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    // the ≤m sample ids broadcast into the embeddings semi-join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q202 unigram encode: distinct-word kernel joined back, never cartesian") {
    // r15 shape: the Viterbi kernel runs once per DISTINCT word (the
    // q154 distinct-word table), so the plan now carries the vocab-scale
    // distinct aggregation and the join back onto the word rows —
    // UnigramSpec pins row-identity with the per-occurrence form.
    val p = plan("q202_unigram_encode")
    assert(p.contains("posexplode"), "word rows come from one explode\n" + p)
    // the kernel side is the distinct-word aggregate, not the occurrences
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      "distinct-word table must aggregate\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q205 zipf top-100 plans WindowGroupLimit over the vocab, not a full per-lang sort") {
    val p = plan("q205_zipf_audit")
    // rank-filter form: each task keeps a local top-100 per lang before the
    // window shuffle — the Heaps-law vocabulary is never globally sorted
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("partial_"), "histogram must map-side combine\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q206 entropy is one histogram shuffle with map-side combine, no join") {
    val p = plan("q206_token_entropy")
    assert(!p.contains("Join"), "entropy fold must not join\n" + p)
    assert(p.contains("partial_"), "histogram must map-side combine\n" + p)
  }

  test("q236/q238 chi² family: contingency histogram map-side combines, no cartesian") {
    for (q <- Seq("q236_chi2_independence", "q238_chi2_effect")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q: cell histogram must map-side combine\n" + p)
      assert(!p.contains("CartesianProduct"), s"$q\n" + p)
    }
  }

  test("q241 JSD: scoring join keyed on the token, never all-to-all") {
    val p = plan("q241_source_jsd")
    // the only nested-loop is the 1-row n_tot scalar broadcast; the token
    // vocabulary must never cartesian (the q122 rule)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Exchange hashpartitioning(token"),
      "the tf join shuffles on the token key (non-broadcastable vocab)\n" + p)
    assert(p.contains("partial_"), "histogram must map-side combine\n" + p)
  }

  test("q247 curation v3: anti-join containment drop via the prefix filter, no cartesian") {
    val p = plan("q247_pipeline_curation_v3")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the containment stage must stay a shingle-keyed equi join\n" + p)
    assert(p.contains("LeftAnti"), "contained docs drop via anti join\n" + p)
    // r12 verdict item 7: the containment candidates must come from the
    // q235 one-sided PREFIX filter, visible as the per-doc row_number
    // window over sid ordered by document frequency (prefixRows) — the
    // plain shared-shingle self-join has no such window
    assert("windowspecdefinition\\(sid#\\d+L?, df#\\d+L".r.findFirstIn(p).isDefined,
      "containment candidates must be prefix-filtered (sid window over df)\n" + p)
  }

  test("q244 truncated-dim eval: bounded query side broadcasts, one scored pass feeds both windows") {
    val p = plan("q244_truncated_dim_eval")
    // the ≠ join is the q44 contract: the 10-row query batch broadcasts
    // into a nested loop over ONE corpus scan — never a cartesian of the
    // corpus with itself
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val windows = "row_number".r.findAllIn(p).length
    assert(windows >= 2, "both rankings must come from the same scored rows\n" + p)
  }

  test("q209/q210 AV decode is per-row kernel work: no exchange before the sort") {
    for (q <- Seq("q209_audio_pcm_stats", "q210_video_motion")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not join\n" + p)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 1, s"$q: only the output-sort exchange allowed, saw $exchanges\n" + p)
    }
  }

  test("q214 RRF fusion: bounded top-k arms, declared queries-broadcast only, no cartesian") {
    val p = plan("q214_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "the fused top-20 must be a heap, not a global sort\n" + p)
    assert(p.contains("partial_"), "bm25 term agg must map-side combine\n" + p)
  }

  test("q215 token budget: level cut broadcasts back, corpus never globally sorted") {
    val p = plan("q215_token_budget")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), "level supply agg must map-side combine\n" + p)
    // The only windows are the bounded level cumsum (constant partition) and
    // the boundary stratum rank (score-keyed) — never a corpus-wide
    // single-partition sort window. A global-sort cumsum would show an
    // Exchange SinglePartition feeding a Sort over doc columns; here the
    // sole SinglePartition exchange carries the metadata-scale level table.
    assert(p.contains("hashpartitioning(score"),
      "boundary rank must key on the stratum\n" + p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      "level cuts must broadcast back to the fact side\n" + p)
  }

  test("q216/q217 classifier eval: histogram fold, never a corpus-wide rank") {
    for (q <- Seq("q216_classifier_auc", "q217_roc_curve",
        "q218_calibration_bins", "q219_calibration_score")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("partial_"), s"$q histogram agg must map-side combine\n" + p)
      // The pair count folds over the score histogram — the corpus rows
      // are never ranked, so no window may consume raw doc columns.
      assert(!p.contains("row_number"), s"$q must not rank the corpus\n" + p)
    }
  }

  test("q221 bitext mining: margin fold is id-keyed joins + group-limit windows") {
    val p = plan("q221_bitext_mining")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), "top-k mean aggs must map-side combine\n" + p)
    assert(p.contains("WindowGroupLimit"),
      "margin-best rank-1 filters must plan as group heaps, not full sorts\n" + p)
  }

  test("q222/q223 perceptual near-dup: band equi join, never all-pairs") {
    for (q <- Seq("q222_image_neardup", "q223_audio_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q candidate stage must join on the band key\n" + p)
    }
  }

  test("q228 ngram novelty: trigram-keyed df join at pair level, never all-to-all") {
    val p = plan("q228_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("partial_"), "df agg must map-side combine\n" + p)
    assert(p.contains("hashpartitioning(tri"),
      "the df lookup must key-shuffle on the trigram\n" + p)
  }

  test("q227 embedding drift: (label, dim)-keyed partial aggs, no cartesian") {
    val p = plan("q227_embedding_drift")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("partial_"), "component sums must map-side combine\n" + p)
    assert(p.contains("hashpartitioning(label"),
      "the shuffle must key on (label, dim), never a single partition\n" + p)
  }

  test("q213 drift report: one id-keyed outer join, partial+final agg, no cartesian") {
    val p = plan("q213_corpus_drift")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("FullOuter"), "classification needs the full outer join\n" + p)
    assert(p.contains("partial_"), "per-lang counts must map-side combine\n" + p)
  }

  test("q208 incremental semdedup cells: cell-keyed join, corpus never probe-replicated") {
    val p = plan("q208_semdedup_incremental_cells")
    // the production ingest path: an equi join on the cell id — never a
    // cross join like the q204 exact-oracle mode
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // only the (small) batch side explodes ×probes; the corpus side is
    // single-assigned, so corpus shuffle volume is N, not N·probes
    val explodes = "Generate explode".r.findAllIn(p).length
    assert(explodes == 1,
      s"expected exactly the batch-side probe explode, saw $explodes\n" + p)
  }

  test("q233 video near-dup: band equi join, never all-pairs") {
    val p = plan("q233_video_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "candidate stage must join on the band key\n" + p)
  }

  test("q234 containment: shingle equi join, partial aggs, no cartesian") {
    val p = plan("q234_containment_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("partial_"), "pair counts must map-side combine\n" + p)
    // the self-join must be an EQUI join on the trigram: a key shuffle at
    // corpus scale, a broadcast at this toy sf — both are fine, a
    // non-equi strategy is not (caught by the cartesian assert above)
    assert(p.contains("hashpartitioning(tri") || p.contains("BroadcastHashJoin"),
      "the shingle join must be an equi join on the trigram\n" + p)
  }

  test("q229 MJPG stats: per-row map, no join before the final sort") {
    val p = plan("q229_video_mjpg_motion")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "decode is embarrassingly parallel — no join belongs here\n" + p)
  }

  test("q230 ANN bitext: cell equi joins + id-keyed fold, no cartesian") {
    val p = plan("q230_bitext_mining_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "IVF candidates must equi-join on the cell; the exact mode's " +
        "cross join must not appear in the ANN path\n" + p)
  }
}
