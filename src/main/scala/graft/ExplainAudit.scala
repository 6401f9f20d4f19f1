package graft

import org.apache.spark.sql.SparkSession

/** Plan audit — automated assertions on the physical plans the 100 TB
  * posture depends on: parquet filter pushdown, column pruning, broadcast
  * joins for dims, TakeOrderedAndProject for top-k, WindowGroupLimit for
  * per-group top-k, whole-stage codegen presence.
  *
  * Runs inside `sbt test` via [[ExplainAuditSpec]] so a plan-shape
  * regression (a lost broadcast, a filter that stopped pushing down) fails
  * the build, not just a manually-run main.
  *
  * Usage: runMain graft.ExplainAudit [sfDir] [queryName...]
  *        (no query names → run the assertion suite and print a summary)
  */
object ExplainAudit {

  /** AdaptiveSparkPlan.toString repeats every node under "== Initial
    * Plan ==" — structural COUNTS must only see the final-plan sections.
    * A split at the FIRST marker is NOT enough: an adaptive scalar
    * subquery (e.g. the bloom-prefiltered shingle probe) nests its own
    * Final/Initial pair mid-string, and the first-marker split would
    * truncate the rest of the MAIN final plan — every negative gate after
    * the subquery would then pass vacuously (ADVICE r8). The sweep is
    * indentation-aware because the main plan RESUMES after a nested
    * initial section at a shallower indent with no re-opening marker: an
    * "== Initial Plan ==" marker at indent k owns every following line
    * indented deeper than k (its subtree — including any doubly-nested
    * markers, which must not re-enable keeping); the first line back at
    * ≤ k exits the section. Plans without markers pass through whole.
    * ExplainAuditSpec pins the real resume-after-subquery shape against
    * the first-marker split. */
  private[graft] def finalPlan(p: String): String = {
    val sb = new StringBuilder
    var skipAt = -1 // when ≥ 0: inside an initial-plan subtree, drop lines indented ≥ skipAt
    p.linesIterator.foreach { l =>
      // a line's tree depth is where its NODE text starts — ':' continuation
      // pipes belong to shallower ancestors and must not count as content
      val indent = l.indexWhere(c => c != ' ' && c != ':') match {
        case -1 => Int.MaxValue // blank/pipe-only line: belongs to the open region
        case i  => i
      }
      if (skipAt < 0 || indent < skipAt) {
        skipAt = -1
        if (l.contains("== Initial Plan ==")) skipAt = indent + 1
        else sb.append(l).append('\n')
      }
    }
    sb.toString
  }

  /** The fw scalar matcher must be evaluated EXACTLY once per row: its
    * `least(CASE WHEN` spans appear [[graft.domain.Fw.matcherLeastCount]]
    * times per instantiation, so any other count means the tree was
    * duplicated (pushed into a scan-level filter — the measured 2.8×
    * regression) or vanished (spelling drift that would make the old
    * presence check vacuous). */
  private[graft] def matcherOnce(p: String): Boolean =
    "least\\(CASE WHEN".r.findAllIn(finalPlan(p)).size ==
      graft.domain.Fw.matcherLeastCount

  /** (query, what-the-plan-must-show, predicate over executedPlan string) */
  val checks: Seq[(String, String, String => Boolean)] = Seq(
    ("filter_compound", "parquet filter pushdown (PushedFilters)",
      p => p.contains("PushedFilters: [") && !p.contains("PushedFilters: []")),
    ("agg_basic", "pruned read schema (only needed columns)",
      p => !p.contains("l_orderkey")),
    ("agg_basic", "partial+final hash aggregation",
      p => "HashAggregate".r.findAllIn(p).size >= 2),
    ("join_broadcast_inner", "dimension broadcast (BroadcastHashJoin)",
      p => p.contains("BroadcastHashJoin")),
    // the literal-ruleset matcher is a scalar expression: the per-event
    // report must be join-free and must never hash-exchange on event_id
    // (its only exchange is the rangepartitioning of the declared ORDER BY)
    ("fw_first_match", "scalar first-match (no join, no event_id hash exchange)",
      p => !p.contains("Join") && !p.contains("hashpartitioning(event_id")),
    // the negative checks above/below can pass vacuously if Spark ever
    // renames the exchange spelling — so every fw check pairs them with
    // [[matcherOnce]], a positive EXACT-COUNT assertion (presence alone
    // proved insufficient: it sat green over the r6 double-evaluation).
    // ExplainAuditSpec proves the pairing non-vacuous against both known
    // regressed plans.
    ("fw_first_match", "scalar matcher evaluated exactly once",
      matcherOnce),
    ("topk", "top-k without global sort (TakeOrderedAndProject)",
      p => p.contains("TakeOrderedAndProject")),
    ("topk_per_group", "per-group top-k limit pushdown (WindowGroupLimit)",
      p => p.contains("WindowGroupLimit")),
    ("join_left_anti", "anti join planned as broadcast/shuffle hash",
      p => p.contains("Anti")),
    ("sim_cosine_topk", "ANN baseline stays TakeOrdered (no full sort)",
      p => p.contains("TakeOrderedAndProject")),
    ("agg_basic", "whole-stage codegen present",
      p => p.contains("WholeStageCodegen") || p.contains("*(")),
    ("text_tokenize_tf", "generate+partial agg before exchange",
      p => p.indexOf("HashAggregate") < p.indexOf("Exchange")
        || p.contains("partial_count")),
    // dedup_exact groups on xxhash64(text): the pre-shuffle partial
    // aggregate must already key on the digest so the exchange carries
    // 8-byte keys, never document bodies.
    ("dedup_exact", "digest-keyed dedup (xxhash64 before the exchange)",
      p => p.contains("xxhash64")),
    // the custom codegen expressions must stay in their hot paths — a
    // refactor that silently falls back to array_intersect / the HOF fold
    // is a multi-x perf regression the result hashes can't see
    // tf-idf: the vocabulary-sized df table must broadcast back onto the
    // (doc, term) aggregate — a hash-exchange join here would reshuffle
    // the corpus-sized tf table — and the per-doc top-3 must prune via
    // WindowGroupLimit rather than rank-then-filter the full term list
    ("text_tfidf", "broadcast df join + per-doc WindowGroupLimit",
      p => p.contains("BroadcastHashJoin") && p.contains("WindowGroupLimit")),
    // bm25: corpus stats ride a 1-row broadcast and the top-20 must be
    // TakeOrderedAndProject, never a global sort
    ("text_bm25", "top-k without global sort (TakeOrderedAndProject)",
      p => p.contains("TakeOrderedAndProject")),
    // contamination: one gram-keyed aggregation collecting both split
    // sides — a reintroduced per-side self-join would double-scan and
    // double-shuffle the gram table (the shape this query replaced)
    ("text_contamination", "single gram aggregation, no self-join",
      p => !p.contains("Join") && p.contains("ObjectHashAggregate")),
    // the exact edit join's candidate stage is an EQUI-join on deletion
    // variants — a nested-loop/cartesian here would mean the signature
    // join silently fell back to all-pairs
    ("sim_edit_join", "variant equi-join + banded verify (no nested loop)",
      p => !p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin")
        && p.contains("levenshtein")),
    ("sim_ngram_jaccard", "codegen merge-scan intersection in the pair join",
      p => p.contains("sorted_intersect_size")),
    // the kNN graph's per-vector top-3 must prune inside the window — a
    // rank-then-filter over the full per-vector neighbor list materializes
    // block² rows per vector at scale
    ("sim_knn_graph", "per-vector top-k pruned in the window (WindowGroupLimit)",
      p => p.contains("WindowGroupLimit") && p.contains("dot_f64")),
    // the PII pass is a single narrow map over the fact scan: no exchange
    // except the declared ORDER BY's range partitioning
    ("text_pii_mask", "map-only scan + order-by (no hash exchange)",
      p => !finalPlan(p).contains("Exchange hashpartitioning")),
    ("dedup_near_embedding", "codegen dot product under the cosine",
      p => p.contains("dot_f64")),
    // percentile_disc is a TypedImperativeAggregate: partial aggregation
    // must run map-side (ObjectHashAggregate), not single-node
    ("agg_percentile", "map-side partial percentile (ObjectHashAggregate)",
      p => p.contains("ObjectHashAggregate")),
    // SQ8 encode is map-only once the frozen params are trained (the
    // train aggregation runs driver-side at query-construction time):
    // the declared plan must be projection + the ORDER BY's range
    // exchange — a join or hash exchange here means the params stopped
    // riding as literals and the 100 TB pipeline-inside-the-scan claim
    // is gone
    // the classifier's model tables (class centroids + class mass) are
    // vocabulary/class bounded and must BROADCAST back onto the tf rows;
    // a sort-merge join here means the corpus is shuffling against its
    // own model — the exact regression the frozen-model form exists to
    // avoid at 100 TB
    // the phrase query's top-1 bigram must be a TakeOrdered cut (a
    // global-window rank would single-partition the pair table) and the
    // winner must ride back as a broadcast — never a shuffle join of the
    // corpus against a 1-row table
    ("lex_phrase", "TakeOrdered top-1 + broadcast winner fan-back",
      p => finalPlan(p).contains("TakeOrderedAndProject")
        && finalPlan(p).contains("BroadcastHashJoin")
        && !finalPlan(p).contains("SortMergeJoin")
        && !finalPlan(p).contains("CartesianProduct")),
    ("lex_phrase3", "TakeOrdered top-1 + broadcast winner fan-back",
      p => finalPlan(p).contains("TakeOrderedAndProject")
        && finalPlan(p).contains("BroadcastHashJoin")
        && !finalPlan(p).contains("SortMergeJoin")
        && !finalPlan(p).contains("CartesianProduct")),
    ("text_classify", "model joins broadcast (no SMJ against the corpus)",
      p => "BroadcastHashJoin".r.findAllIn(finalPlan(p)).size >= 2
        && !finalPlan(p).contains("SortMergeJoin")),
    // the hashed form must keep the same broadcast-model shape AND its
    // bigram fan-out lambda-free (slice+zip, the transitions discipline)
    ("text_classify_bigram",
      "broadcast hashed model + lambda-free bigram fan-out, no SMJ",
      p => "BroadcastHashJoin".r.findAllIn(finalPlan(p)).size >= 2
        && !finalPlan(p).contains("SortMergeJoin")
        && !finalPlan(p).contains("lambdafunction")),
    ("sim_sq_encode", "map-only encode (params as literals, no join)",
      p => !finalPlan(p).contains("Join")
        && !finalPlan(p).contains("Exchange hashpartitioning")),
    // the Misra–Gries aggregate must run two-phase so the exchange
    // carries one ≤k-entry sketch per partition per group — a plan that
    // shuffles raw (group, item) rows first is the 100 TB regression this
    // operator exists to avoid; and the item fan-out must stay a generate,
    // not a join
    ("agg_heavy_hitters",
      "two-phase sketch aggregate (k counters through the exchange)",
      p => "ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2
        && !p.contains("hashpartitioning(o_orderpriority")
        && !p.contains("Join")),
    // the MAD outlier report's per-type stats must broadcast back onto
    // the fact stream (a sort-merge join here would shuffle the events
    // table twice), with both percentile passes partial-aggregated
    ("profile_outliers", "broadcast stats + map-side percentiles, no SMJ",
      p => p.contains("ObjectHashAggregate") && p.contains("BroadcastHashJoin")
        && !finalPlan(p).contains("SortMergeJoin")),
    // the fw COUNT family must never exchange one row per fact event: the
    // scalar matcher reduces first-match in the map stage, so the only
    // exchanges key on tiny aggregation keyspaces. A reintroduced
    // groupBy(event_id) disambiguation is THE scale regression here — at
    // 100 TB it shuffles the whole fact table.
    ("fw_hit_count", "no per-event exchange + matcher evaluated exactly once",
      p => !p.contains("hashpartitioning(event_id") && matcherOnce(p)),
    // …and a shape bound: the whole query is matcher → partial+final agg →
    // ORDER BY, so at most one hash exchange (tiny (acl, rule_seq) keys)
    // and one range exchange may appear. A third exchange of any spelling
    // means per-event work leaked back in.
    ("fw_hit_count", "at most 2 exchanges (agg + order-by)",
      p => "Exchange (hash|range)partitioning".r
        .findAllIn(finalPlan(p)).size <= 2),
    ("fw_usage_report", "no per-event exchange + matcher evaluated exactly once",
      p => !p.contains("hashpartitioning(event_id") && matcherOnce(p)),
    // the entry report's three dimension attributions must ride ONE fact
    // scan (explode into (dim, entry_ix) rows → one config-sized
    // aggregate); the rejected rollup-union form scanned the fact table
    // once PER DIMENSION because per-branch column pruning made the
    // three combo subtrees non-identical and killed exchange reuse
    ("fw_entry_usage", "single fact scan + matcher evaluated exactly once",
      p => matcherOnce(p) && !p.contains("hashpartitioning(event_id")
        && "FileScan parquet".r.findAllIn(finalPlan(p)).size == 1),
    ("fw_action_share", "no per-event exchange + matcher evaluated exactly once",
      p => !p.contains("hashpartitioning(event_id") && matcherOnce(p)),
    ("fw_hits_timeseries", "no per-event exchange + matcher evaluated exactly once",
      p => !p.contains("hashpartitioning(event_id") && matcherOnce(p)),
    ("fw_per_rule_stats", "no per-event exchange + matcher evaluated exactly once",
      p => !p.contains("hashpartitioning(event_id") && matcherOnce(p)),
    // the per-lang median thresholds are a tiny dimension — the corpus
    // probe must broadcast them, never shuffle the scored documents
    ("text_quality_filter", "broadcast median-threshold probe",
      p => p.contains("BroadcastHashJoin")),
    // bigram fan-out must stay lambda-free: a HOF transform() here runs
    // interpreted per element (measured ~7x slower) — the plan must show
    // the zip of shifted slices instead
    ("text_ngrams", "lambda-free bigram fan-out (slice+zip, no transform())",
      p => !p.contains("lambdafunction")),
    // repetition signals share the lambda-free bigram fan-out, and the
    // (doc, bigram) stage must partial-aggregate before its exchange
    ("text_repetition", "lambda-free bigrams + partial agg before exchange",
      p => !p.contains("lambdafunction")
        && (p.indexOf("HashAggregate") < p.indexOf("Exchange")
          || p.contains("partial_count"))),
    // mixture sampling is a pure map-side filter: no exchange beyond the
    // declared ORDER BY's range partitioning
    ("sample_mix", "map-only mixture filter (no hash exchange)",
      p => !finalPlan(p).contains("Exchange hashpartitioning")),
    ("text_ngrams", "partial agg before the bigram exchange",
      p => p.indexOf("HashAggregate") < p.indexOf("Exchange")
        || p.contains("partial_count")),
    // the Q3-shaped composite must keep all three scan filters pushed down,
    // broadcast the filtered customer dim, and top-k without a global sort
    ("composite_q3", "filtered dim broadcast in the 3-way join",
      p => p.contains("BroadcastHashJoin")),
    ("composite_q3", "top-k via TakeOrderedAndProject",
      p => p.contains("TakeOrderedAndProject")),
    ("composite_q3", "segment filter pushed to the customer scan",
      p => p.contains("EqualTo(c_mktsegment,BUILDING)")),
    // substring dedup: shingles must travel as 8-byte xxhash64 digests
    // (never gram strings), the k-slice fan-out must stay lambda-free, and
    // the gram-share count must partial-aggregate before its exchange —
    // the corpus-sized shuffle carries (digest, doc_id), nothing wider
    ("text_substring_dedup", "digest shingles, lambda-free, partial agg",
      p => p.contains("xxhash64") && !p.contains("lambdafunction")
        && (p.indexOf("HashAggregate") < p.indexOf("Exchange")
          || p.contains("partial_count"))),
    // the per-doc span budget joins a doc-keyed aggregate back to a slim
    // (doc_id, n_tokens) projection: same digest discipline, and the join
    // must stay keyed (doc_id) — a nested-loop fallback here would pair
    // the corpus against the span table
    ("text_substring_dedup_filter", "digest shingles + keyed budget join",
      p => p.contains("xxhash64") && !p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin")),
    // the corpus-rewrite mask must run the codegen'd two-pointer sweep,
    // never the interpreted filter+exists HOF pair it replaced (which
    // also broke the enclosing whole-stage span)
    ("text_substring_mask", "codegen mask_spans sweep (no interpreted lambda)",
      p => p.contains("mask_spans") && !finalPlan(p).contains("lambdafunction")),
    // the correlated LATERAL top-2 must decorrelate into the pruned
    // window (WindowGroupLimit) with the tiny nation side broadcast — a
    // per-nation re-executed subquery or a rank-filter over the full
    // customer list would both be scale regressions
    ("join_lateral", "decorrelated to WindowGroupLimit + broadcast",
      p => p.contains("WindowGroupLimit") && p.contains("BroadcastHashJoin")),
    // composed mode: both aggregation stages must partial-aggregate
    // map-side — the (type, value) keyspace bounds the only real shuffle
    ("agg_mode", "two-stage partial aggregation",
      p => p.contains("partial_count") || p.contains("partial_max")),
    // rfm: the quartile thresholds ride a 1-row broadcast back onto the
    // per-customer table (never a global ntile window single-partitioning
    // the dimension), and the percentiles aggregate map-side
    ("composite_rfm", "broadcast thresholds + map-side percentile, no Window",
      p => p.contains("BroadcastNestedLoopJoin")
        && p.contains("ObjectHashAggregate")
        && !finalPlan(p).contains("Window")),
    // chunking is a per-row explode: no join, no hash exchange (the only
    // exchange is the declared ORDER BY's range partitioning), and the
    // window slice must stay lambda-free (slice, not a transform())
    ("text_chunk", "map-only explode fan-out (no join/hash exchange)",
      p => !p.contains("Join")
        && !finalPlan(p).contains("Exchange hashpartitioning")
        && !p.contains("lambdafunction")),
    // split assignment is a pure projection of doc_id: nothing but the
    // scan and the determinism sort may appear
    ("split_assign", "map-only projection (no join/hash exchange)",
      p => !p.contains("Join")
        && !finalPlan(p).contains("Exchange hashpartitioning")),
    // pair groupBy is the one corpus shuffle; the vocabulary-bounded
    // unigram table and the 1-row N come BACK as broadcasts, never a
    // sort-merge join
    ("text_collocations",
      "pair agg + 2 broadcast unigram joins + broadcast N, no SMJ",
      p => "BroadcastHashJoin".r.findAllIn(p).size >= 2
        && p.contains("BroadcastNestedLoopJoin")
        && !p.contains("SortMergeJoin")),
    // the export IS one hash exchange on shard + per-shard sort; nothing
    // else may shuffle, and no join belongs anywhere near it
    ("export_shuffle", "single shard exchange + in-shard sort, no join",
      p => !p.contains("Join")
        && "Exchange hashpartitioning".r
          .findAllIn(finalPlan(p)).size == 1),
    // the rank-≤-K filter must collapse into a per-partition top-K
    // (WindowGroupLimit) so only K rows per domain survive the exchange
    ("sample_domain_cap", "per-domain cap via WindowGroupLimit, no join",
      p => p.contains("WindowGroupLimit") && !p.contains("Join")),
    // the benchmark gram set is the SMALL side by construction (eval
    // suites << corpus): it must come back as a broadcast left join, and
    // the corpus side must never sort-merge against it
    ("decont_probe", "bench grams broadcast to the corpus side, no SMJ",
      p => p.contains("BroadcastHashJoin")
        && !p.contains("SortMergeJoin")),
    // the 4-stage composition's heavy stages execute inside their
    // localCheckpoint materializations (each stage's own query family
    // plan-gates them: text_substring_dedup digests, sim_ngram_jaccard's
    // codegen merge scan, dedup_exact's xxhash64 keying), so the report's
    // OWN executed plan must be only the slim residue: the ledger's
    // partial+final aggregate over checkpointed id-set scans — no
    // sort-merge join, no interpreted lambda, and no text column may
    // survive into the final aggregation
    ("curation_report", "composition residue: slim ledger aggregate only",
      p => {
        val f = finalPlan(p)
        "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction") &&
          !f.contains("text#")
      }),
    // the BQ probe is a pure signature scan: packed-long bit arithmetic
    // + TakeOrdered — a join, a hash exchange, or a HOF lambda here means
    // the 32×-compression scan stopped being a scan
    ("sim_bq_topk", "lambda-free bit_count scan + TakeOrderedAndProject",
      p => p.contains("TakeOrderedAndProject") && p.contains("bit_count")
        && !p.contains("lambdafunction")
        && !finalPlan(p).contains("SortMergeJoin")),
    // the LM tables (bigram, unigram ×2, corpus N) must all broadcast
    // back onto the transition stream — any sort-merge join re-shuffles
    // the corpus-sized fan-out once per LM table at 100 TB; the per-doc
    // rollup must be partial+final
    ("text_lm_score", "broadcast LM tables + two-phase doc rollup, no SMJ",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin".r.findAllIn(f).size >= 3 &&
          "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // round-1 BPE pair stats: the slice+zip fan-out must stay a generate
    // (no lambda, no join) feeding a partial+final count with TakeOrdered
    ("text_bpe_pairs", "lambda-free pair fan-out + partial agg + TakeOrdered",
      p => p.contains("TakeOrderedAndProject")
        && "HashAggregate".r.findAllIn(finalPlan(p)).size >= 2
        && !p.contains("Join") && !p.contains("lambdafunction")),
    // unigram seed stats: the two substring-window fan-outs must stay
    // generates (no lambda, no join), the candidate count partial+final,
    // the top-100 a TakeOrdered cut
    ("text_unigram_seed",
      "lambda-free window fan-out + partial agg + TakeOrdered",
      p => p.contains("TakeOrderedAndProject")
        && "HashAggregate".r.findAllIn(finalPlan(p)).size >= 2
        && !p.contains("Join") && !p.contains("lambdafunction")),
    // the trigram chain adds two more LM tables (tri + the context
    // bigram view) — five broadcasts onto one fan-out, still no SMJ
    ("text_lm3_score", "broadcast trigram chain + two-phase rollup, no SMJ",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin".r.findAllIn(f).size >= 5 &&
          "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // DSIR: BOTH LM-table sets (bigram + unigram ×2 + N, twice) must
    // broadcast onto the shared transition stream — at sf scale even the
    // final score-pair equi-join broadcasts; what may never appear is a
    // sort-merge join or a lambda
    ("sample_dsir", "all-broadcast double-LM scoring, no SMJ",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin".r.findAllIn(f).size >= 6 &&
          "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // drift report: the checkpointed 2-column stream is rolled up with
    // partial aggregation; the median and totals ride 1-row broadcasts
    // back — a sort-merge join or hash exchange of the fact stream means
    // the broadcast-back shape regressed
    ("profile_drift", "1-row broadcasts onto partial-agg rollups, no SMJ",
      p => {
        val f = finalPlan(p)
        "BroadcastNestedLoopJoin".r.findAllIn(f).size >= 2 &&
          "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // retrieval eval: the eval-sized probe set rides a broadcast
    // nested-loop fan-out over ONE corpus scan, per-probe top-k prunes
    // map-side via WindowGroupLimit before the probe-keyed exchange, and
    // the cosine is the codegen dot (no HOF lambda); a sort-merge join
    // here would mean the corpus shuffled against the probes
    ("eval_retrieval", "broadcast probe fan-out + WindowGroupLimit, no SMJ",
      p => {
        val f = finalPlan(p)
        f.contains("BroadcastNestedLoopJoin") &&
          f.contains("WindowGroupLimit") &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // hard-negative mining shares the probe fan-out; both per-anchor
    // rank windows must group-limit, and the pos×neg assembly join stays
    // a broadcast (anchor-bounded sides)
    ("mine_hard_negatives", "two group-limited rank windows, no SMJ",
      p => {
        val f = finalPlan(p)
        "WindowGroupLimit".r.findAllIn(f).size >= 2 &&
          f.contains("BroadcastNestedLoopJoin") &&
          !f.contains("SortMergeJoin") && !f.contains("lambdafunction")
      }),
    // multi-term BM25 search: the vocabulary-sized df table must
    // broadcast back onto the (doc, term) tf aggregate (a sort-merge join
    // would reshuffle the corpus-sized tf table), the tf aggregate must
    // partial+final, and the top-20 must be TakeOrderedAndProject. (The
    // sorted-fold lambda is deliberate: it runs once per RESULT doc over
    // a ≤|terms| array, not per corpus element.)
    ("lex_search", "broadcast df join + partial tf agg + TakeOrdered",
      p => {
        val f = finalPlan(p)
        f.contains("BroadcastHashJoin") &&
          f.contains("TakeOrderedAndProject") &&
          "HashAggregate".r.findAllIn(f).size >= 2 &&
          !f.contains("SortMergeJoin")
      }),
    // hybrid RRF: BOTH legs must be cut by TakeOrderedAndProject before
    // any rank window runs — the fusion join and its windows then operate
    // on k-bounded inputs, so whatever join strategy Spark picks for the
    // 50-row full-outer is scale-irrelevant. Two TakeOrdered spans = the
    // corpus is never globally sorted or globally windowed.
    ("sim_hybrid_rrf", "both legs TakeOrdered-cut before ranking/fusion",
      p => "TakeOrderedAndProject".r.findAllIn(finalPlan(p)).size >= 2),
    // boilerplate mining is the digest-groupBy shape: partial+final agg
    // (two HashAggregate pairs — the distinct-doc pre-key and the line
    // rollup), join-free
    ("text_boilerplate", "join-free partial+final line aggregation",
      p => {
        val f = finalPlan(p)
        "HashAggregate".r.findAllIn(f).size >= 4 && !f.contains("Join")
      }),
    // the boilerplate membership set must BROADCAST onto the corpus line
    // stream (an SMJ would re-shuffle every corpus line by raw line text);
    // the reassembly groupBy keys on doc_id — an ObjectHashAggregate
    // (collect_list), partial+final
    ("text_line_dedup", "broadcast boilerplate set, no corpus SMJ",
      p => {
        val f = finalPlan(p)
        f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin") &&
          f.contains("ObjectHashAggregate")
      }),
    // the gapfill grid: hour bounds ride a 1-row broadcast (BNLJ), the
    // locf window is type-partitioned (no global window), and the hourly
    // pre-aggregation is partial+final
    ("ts_gapfill", "broadcast bounds + type-partitioned locf window",
      p => {
        val f = finalPlan(p)
        // the locf Window's spec must carry the event_type partition key
        // (a global window would single-partition the grid) and the hour
        // bounds must ride a broadcast, not an exchange
        f.contains("BroadcastNestedLoopJoin") &&
          "Window \\[[^\\]]*windowspecdefinition\\(event_type".r
            .findFirstIn(f).isDefined
      }),
    // cohort sizes are week-cardinality: they must broadcast back onto
    // the offset aggregate, never re-shuffle it
    ("cohort_retention", "cohort sizes broadcast, partial+final aggs",
      p => {
        val f = finalPlan(p)
        f.contains("BroadcastHashJoin") &&
          "HashAggregate".r.findAllIn(f).size >= 4
      }),
    // the XML round-trip is a per-row kernel: from_xml present, no
    // join, nothing before the declared ORDER BY's range exchange
    ("fn_xml", "map-only from_xml round-trip",
      p => {
        val f = finalPlan(p)
        f.contains("from_xml") && !f.contains("Join") &&
          "Exchange".r.findAllIn(f).size == 1
      }),
    // the CSV round-trip is a per-row kernel: from_csv present, no
    // join, nothing before the declared ORDER BY's range exchange
    ("fn_csv", "map-only from_csv round-trip",
      p => {
        val f = finalPlan(p)
        f.contains("from_csv") && !f.contains("Join") &&
          "Exchange".r.findAllIn(f).size == 1
      }),
    // same posture for the JSON serialize→parse pair
    ("fn_json_rt", "map-only to_json/from_json round-trip",
      p => {
        val f = finalPlan(p)
        f.contains("from_json") && !f.contains("Join") &&
          "Exchange".r.findAllIn(f).size == 1
      }),
    // VARIANT access must stay the typed variant_get path (a rewrite
    // back to string get_json_object would re-parse per access) and the
    // per-type rollup must partial+final
    ("fn_variant", "typed variant_get path + partial+final agg",
      p => {
        val f = finalPlan(p)
        f.contains("variant_get") && !f.contains("get_json_object") &&
          "HashAggregate".r.findAllIn(f).size >= 2
      }),
    // the recursive CTE must plan through the UnionLoop machinery (a
    // silent rewrite to something non-recursive would change semantics)
    ("sql_recursive_cte", "UnionLoop recursion in the physical plan",
      p => p.contains("UnionLoop")),
    // NFC normalization is a per-row kernel: nothing before the declared
    // ORDER BY's range exchange, and the nfc_normalize expression must
    // sit inside a WholeStageCodegen span (a CodegenFallback would break
    // the map stage into interpreted rows)
    ("text_normalize", "map-only NFC inside whole-stage codegen",
      p => {
        val f = finalPlan(p)
        "Exchange".r.findAllIn(f).size == 1 && !f.contains("Join") &&
          f.contains("nfc_normalize") &&
          (f.contains("WholeStageCodegen") || f.contains("*("))
      }),

    // round 14: the embedding fingerprint must be the rademacher_fp
    // kernel inside codegen, map-only before the declared ORDER BY's
    // range exchange — if the kernel ever falls back to the composed
    // 63-dot-product form the projection drops out of codegen (measured
    // 87× slower) and this gate fails before bench noise could hide it
    ("sim_embed_fp", "rademacher_fp kernel, map-only, inside codegen",
      p => {
        val f = finalPlan(p)
        f.contains("rademacher_fp") && !f.contains("Join") &&
          !f.contains("dot_f64") &&
          (f.contains("WholeStageCodegen") || f.contains("*("))
      }),
    // the banded self-join must key its exchanges on the block values,
    // never ship an all-pairs product
    ("dedup_embed_fp", "banded fp join keyed on (blk, bval)",
      p => {
        val f = finalPlan(p)
        !f.contains("CartesianProduct") &&
          (f.contains("hashpartitioning(blk") ||
            f.contains("hashpartitioning(pb") || f.contains("bval"))
      }),
    // the salted join's exchanges must carry the salt in their keys —
    // that IS the operator; a Catalyst simplification that dropped the
    // salt would still pass correctness (result ≡ plain join)
    ("join_skew_salted", "join exchanges keyed on (key, salt)",
      p => {
        val f = finalPlan(p)
        f.contains("salt_l") && f.contains("salt_r")
      }),
    // the quality bucketing must keep the lm_score plan family's
    // broadcast-model discipline and exactly one window (the per-lang
    // ntile) — a model join flipping to SMJ re-shuffles the corpus
    ("sample_quality_bucket", "broadcast LM joins + one ntile window",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin".r.findAllIn(f).size >= 3 &&
          f.contains("ntile(3)") && !f.contains("SortMergeJoin")
      }),
    // the wordpiece selection table: symbol-count joins broadcast, the
    // declared top-50 stays TakeOrdered (no global sort)
    ("text_wordpiece_pairs", "broadcast symbol joins + TakeOrdered",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin".r.findAllIn(f).size >= 2 &&
          f.contains("TakeOrderedAndProject") &&
          !f.contains("SortMergeJoin")
      }),
    // the Hilbert clustering key: one fused kernel in a map-only plan,
    // inside whole-stage codegen — no join, no shuffle before the sort
    ("fn_hilbert", "hilbert_d kernel, map-only, inside codegen",
      p => {
        val f = finalPlan(p)
        f.contains("hilbert_d") && !f.contains("Join") &&
          (f.contains("WholeStageCodegen") || f.contains("*("))
      }),
    // the N-dim Hilbert key (round 16): same posture — one fused
    // Skilling kernel, map-only, inside whole-stage codegen
    ("fn_hilbert_nd", "hilbert_nd kernel, map-only, inside codegen",
      p => {
        val f = finalPlan(p)
        f.contains("hilbert_nd") && !f.contains("Join") &&
          (f.contains("WholeStageCodegen") || f.contains("*("))
      }),
    // IVF serving (round 14): the 16-centroid table broadcasts into the
    // assignment, the nprobe probe-list cut broadcasts into a LeftSemi
    // (at scale: static partition pruning on centroid_id), and the final
    // k stays TakeOrdered — no sort-merge anywhere, nothing corpus-sized
    // on the build side of any join
    ("sim_ivf_topk", "broadcast assignment + semi-join probe cut + TakeOrdered",
      p => {
        val f = finalPlan(p)
        "BroadcastHashJoin .*LeftSemi".r.findFirstIn(f).nonEmpty &&
          f.contains("TakeOrderedAndProject") &&
          !f.contains("SortMergeJoin")
      })
  )

  // ------------------------------------------------------------------
  // Whole-surface structural floor + fingerprint manifest (round 14,
  // VERDICT r13 #1). The targeted checks above gate ~half the declared
  // keys; a silent broadcast→SMJ flip or a lost pushdown in an ungated
  // key passes correctness, determinism, and bench noise undetected. The
  // sweep below runs EVERY declared query and (a) asserts a structural
  // floor no key may violate, (b) records a per-key operator fingerprint
  // into dev/plan_map.json, diffed in ExplainAuditSpec — so ANY
  // structural plan change anywhere on the surface fails `sbt test`
  // until it is explicitly committed as intended.

  /** Nodes no declared query's final plan may contain: an unblocked
    * cartesian product, any Python/Scala UDF evaluation, or typed
    * object-space operators (the zero-UDF policy — `mapPartitions` is
    * sanctioned only in the two non-declared sites, KLL build and media
    * decode, which have no Catalyst equivalent). */
  private[graft] val bannedNodes: Seq[String] = Seq(
    "CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
    "FlatMapGroupsInPandas", "MapPartitions", "MapElements",
    "DeserializeToObject", "UDF(")

  /** Per-key exemptions from the floor — each one a contract row whose
    * SEMANTICS is the banned node. */
  private[graft] val floorExempt: Map[String, Set[String]] = Map(
    "join_cross" -> Set("CartesianProduct")) // B3.8 IS the cross join

  /** (key, banned-node) pairs present in any final plan — must be empty. */
  def floorViolations(plans: Seq[(String, String)]): Seq[(String, String)] =
    plans.flatMap { case (name, p) =>
      val f = finalPlan(p)
      bannedNodes
        .filter(b => f.contains(b) &&
          !floorExempt.getOrElse(name, Set.empty).contains(b))
        .map(name -> _)
    }

  /** Structural fingerprint of a final plan: counts of every exchange /
    * join / aggregate / window / generate / scan node family. Counts are
    * partitioning-independent (node structure, not partition counts), so
    * the manifest is stable across local[2]/local[4] and box load. */
  private[graft] def fingerprint(plan: String): Seq[(String, Int)] = {
    val f = finalPlan(plan)
    def n(re: String) = re.r.findAllIn(f).size
    Seq(
      "x_hash" -> n("Exchange hashpartitioning"),
      "x_range" -> n("Exchange rangepartitioning"),
      "x_single" -> n("Exchange SinglePartition"),
      "x_bcast" -> n("BroadcastExchange"),
      "j_bhj" -> n("BroadcastHashJoin"),
      "j_smj" -> n("SortMergeJoin"),
      "j_shj" -> n("ShuffledHashJoin"),
      "j_bnlj" -> n("BroadcastNestedLoopJoin"),
      "j_cart" -> n("CartesianProduct"),
      "agg_hash" -> n("HashAggregate"),
      "agg_obj" -> n("ObjectHashAggregate"),
      "agg_sort" -> n("SortAggregate"),
      "win" -> n("\\bWindow\\b"),
      "wgl" -> n("WindowGroupLimit"),
      "topk" -> n("TakeOrderedAndProject"),
      "gen" -> n("\\bGenerate\\b"),
      "scan" -> n("FileScan"))
  }

  /** The first real operator of the final plan (under AQE headers). */
  private[graft] def topOp(plan: String): String =
    finalPlan(plan).linesIterator
      .filterNot(l => l.contains("==") || l.contains("AdaptiveSparkPlan")
        || l.contains("ResultQueryStage") || l.trim.isEmpty)
      .flatMap(l => "[A-Za-z][A-Za-z0-9]*".r.findFirstIn(l))
      .nextOption().getOrElse("?")

  /** Run EVERY declared query and return (key, executedPlan string)
    * sorted by key. The sweep runs with AQE OFF: AQE's runtime re-plan
    * is measurably nondeterministic at this scale (cohort_retention's
    * distinct-dedup exchange is dropped on ~1 in 4 runs when a runtime
    * coalesce leaves the child single-partition), so an equality-diffed
    * manifest over adaptive plans would flake. The static plan is the
    * right gate anyway — it is where a lost broadcast() hint, a lost
    * pushdown, or a join-strategy regression originates; the targeted
    * [[checks]] keep gating the adaptive plans. */
  def allPlans(spark: SparkSession, sfDir: String): Seq[(String, String)] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      name -> df.queryExecution.executedPlan.toString
    } finally spark.conf.set(key, prev)
  }

  /** Run every declared query WITH AQE ON (the production setting) and
    * return the FINAL adaptive plan strings — the input to
    * [[aqeViolations]]. Unlike [[allPlans]] these are NOT
    * equality-diffed (adaptive re-plans are measurably nondeterministic
    * at this scale — see allPlans' scaladoc); they are gated by
    * INVARIANTS that hold under any legal runtime re-plan. */
  def adaptivePlans(spark: SparkSession,
      sfDir: String): Seq[(String, String)] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      name -> df.queryExecution.executedPlan.toString
    } finally spark.conf.set(key, prev)
  }

  /** AQE-final invariant violations (round 15 — closes the r14 verdict's
    * "AQE-final plans are ungated outside the targeted checks" window):
    * for every key, the FINAL adaptive plan must satisfy, against its
    * static twin,
    *
    *   1. the structural floor (no banned node — same sweep as the
    *      static gate, same join_cross exemption);
    *   2. CartesianProduct count EQUAL to static (AQE may neither
    *      introduce nor lose one — losing one means the key's semantics
    *      changed shape);
    *   3. SortMergeJoin count ≤ static (a runtime BROADCAST DEMOTION
    *      raises it; AQE's legal SMJ→BHJ promotion only lowers it).
    *
    * Invariants, not fingerprints: exchange placement and stage reuse
    * genuinely vary run to run under AQE, but none of the legal
    * variations can violate 1–3. */
  def aqeViolations(staticPlans: Seq[(String, String)],
      adaptive: Seq[(String, String)]): Seq[(String, String)] = {
    val stat = staticPlans.toMap
    val floor = floorViolations(adaptive).map { case (k, n) =>
      (k, s"banned node $n in adaptive final plan") }
    val inv = adaptive.flatMap { case (name, ap) =>
      stat.get(name).toSeq.flatMap { sp =>
        val fa = fingerprint(ap).toMap
        val fs = fingerprint(sp).toMap
        val out = Seq.newBuilder[(String, String)]
        if (fa("j_cart") != fs("j_cart"))
          out += name ->
            s"CartesianProduct ${fa("j_cart")} != static ${fs("j_cart")}"
        if (fa("j_smj") > fs("j_smj"))
          out += name -> ("runtime broadcast demotion: SortMergeJoin " +
            s"${fa("j_smj")} > static ${fs("j_smj")}")
        out.result()
      }
    }
    floor ++ inv
  }

  /** Render the manifest: one line per key, zero counts omitted, keys
    * sorted — a one-key regression is a one-line git diff. */
  def manifest(plans: Seq[(String, String)]): String = {
    val rows = plans.map { case (name, p) =>
      val counts = fingerprint(p).filter(_._2 > 0)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s"""  "$name": {"top":"${topOp(p)}"${
        if (counts.nonEmpty) "," + counts else ""}}"""
    }
    "{\n" + rows.mkString(",\n") + "\n}\n"
  }

  /** Executes each checked query (collect(), so AQE finalizes — codegen
    * spans and reused exchanges only appear in the final plan) and applies
    * its predicate. Returns (query, what, passed, plan). */
  def run(spark: SparkSession, sfDir: String): Seq[(String, String, Boolean, String)] = {
    val plans = scala.collection.mutable.Map.empty[String, String]
    def plan(name: String): String = plans.getOrElseUpdate(name, {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      df.queryExecution.executedPlan.toString
    })
    checks.map { case (q, what, ok) =>
      val p = plan(q)
      (q, what, ok(p), p)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.lift(1).contains("--map")) {
      // whole-surface sweep: print floor violations + write the manifest
      // (for inspection; the COMMITTED dev/plan_map.json is produced by
      // ExplainAuditSpec under the test session's config)
      val plans = allPlans(spark, sfDir)
      val bad = floorViolations(plans)
      bad.foreach { case (q, node) => println(s"FLOOR  $q: $node") }
      Artifacts.write("plan_map.json", manifest(plans).stripSuffix("\n"))
      println(s"MAP ${plans.size} keys, ${
        if (bad.isEmpty) "FLOOR CLEAN" else s"${bad.size} floor violations"}")
      spark.stop(); if (bad.nonEmpty) sys.exit(1) else return
    }

    if (args.length > 1) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }

    var fails = 0
    run(spark, sfDir).foreach { case (q, what, good, p) =>
      if (!good) fails += 1
      println(s"${if (good) "PASS" else "FAIL"}  $q: $what")
      if (!good) println(p.linesIterator.take(40).mkString("\n"))
    }
    println(s"AUDIT ${if (fails == 0) "CLEAN" else s"$fails FAILURES"}")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
