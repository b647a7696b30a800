package graft
// dev-only: dump formatted physical plans for representative queries
// into PLANS.md (run after plan-affecting changes)
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object DevPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // show codegen stages
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "q03_devig" -> "window devig chain: ONE exchange feeds all window passes",
      "q12_join_enrich" -> "star join: all three dims broadcast, filters pushed to scans",
      "q25_lsh_pairs" -> "MinHash-LSH: signature behind exchange barrier, banded equi-join (no cross product)",
      "q28_ann_topk" -> "ANN: broadcast query side, corpus never shuffles before scoring",
      "q33_global_topk" -> "global top-k plans as TakeOrderedAndProject (no full sort)",
      "q35_asof_join" -> "as-of join: tagged union + one window, single shuffle over both sides",
      "q41_clean_corpus" -> "corpus clean: quality+lang+fingerprint in ONE scan pass (native single-pass exprs — no repeated marker chains), dedup = one fingerprint window",
      "q47_simhash_pairs" -> "SimHash near-dup: 4x16-bit band explode -> band equi-join, hamming filter BEFORE the pair-dedup shuffle; scales as bucket-join, never all-pairs",
      "q49_rf_forecast" -> "RF forecast: rolling-feature window once, deterministic split, MLlib fit driver-side; scoring stays distributed, bounds broadcast (1 row)",
      "q50_dup_clusters" -> "connected components: the dumped plan is the POST-fixpoint labels frame — a bare scan over the round-k checkpoint, proving lineage is truncated per round (plans never grow with iterations); per-round work = edge join + vertex-sized min-agg, O(log diameter) via deferred pointer jumping",
      "q66_tfidf" -> "TF-IDF: ONE tokenize+explode (df is a window count over the tf aggregate — no second Generate subtree), broadcast 1-row corpus count, per-doc top-k window",
      "q70_neardup_rescore" -> "exact-Jaccard rescore: LSH banded candidates only, then a LEFT-SEMI prune so shingle arrays are built+shuffled ONLY for candidate docs — at 100 TB the rescore moves candidate-proportional data, never the corpus",
      "q71_hll_distinct" -> "HLL cardinality: per-row hash -> (register, rho) projection, partial max collapses every partition to <=256 rows BEFORE the one exchange — |vocab| estimated without shuffling a single token",
      "q73_cms_heavy_hitters" -> "Count-Min: partial sums cap each partition's shuffle at d*w counter cells; probe estimates join the BROADCAST counter table — frequency queries never re-touch the corpus",
      "q80_range_join" -> "range join: intervals explode to <=2 time buckets -> plain shuffled equi-join + residual filter; the naive inequality join would be a per-key nested loop",
      "q82_asof_forward" -> "forward as-of with tolerance: q35's single-shuffle union+window walked in descending time; the tolerance check is a post-window projection, no extra exchange",
      "q79_oov_rate" -> "vocab probe: ONE tokenize — map-side (doc_id, token) counts behind a repartition(token) barrier; the vocab branch is a ReusedExchange of the probe branch's shuffle (the pruning-guard aggregate keeps the subtrees identical)",
      "q85_training_data_build" -> "capstone: clean + langID + exact dedup + split + chunk + pack in ONE plan — single corpus scan (gen=1), fingerprint window, (split,bucket) cumsum window, 3-row aggregate; no joins anywhere",
      "q87_ann_recall" -> "ANN recall eval: brute truth + IVF + IVF-PQ share the broadcast-queries shape (corpus never shuffles to score); hit-count joins are k*|sample|-sized; the summary is a 2-row union of scalar aggregates",
      "q88_quality_survivors" -> "quality-aware survivors: CC label table (sliver) LEFT-joined to per-doc scores on doc_id, argmax-quality pick = one window over cluster_id; no text in any post-scan exchange",
      "q96_unigram_logprob" -> "unigram-LM surprise: ONE tokenize behind the repartition(token) barrier; the frequency table is a ReusedExchange of the probe branch, so freq JOIN probe is token-colocated on BOTH sides — the full vocabulary never broadcasts or re-shuffles",
      "q100_token_budget_select" -> "token-budget selection: a global quality-ordered cumsum decomposed into a distributed prefix sum — within-bucket windows on the ONE shared bucket exchange (scan=1), cross-bucket offsets from a <=101-row aggregate broadcast back; no corpus-sized global sort or single-partition window",
      "q102_zorder_layout" -> "z-order layout audit: Morton code is a pure codegen'd integer projection over the scan; the ONLY exchange carries <=16 partial-aggregated file rows — layout quality for a 100 TB table is audited without moving the table",
      "q103_length_batch_pack" -> "length-bucketed packing: batching window partitions by (bucket, hash-shard) so a dominant length bucket splits across the cluster (no single-partition WindowExec); the per-batch aggregate reuses the window's (bucket,shard) exchange — subset-clustering, no second corpus shuffle — and the bucket rollup exchanges only per-batch rows",
      "q104_contamination_spans" -> "contamination spans: ONE native pass per doc (tokenize→slide→md5, the PositionalShingleHashes expression — no per-element re-tokenize) posexplodes into a BROADCAST semi-probe of the eval set; the window rides the shared docs() hash partitioning so only hit (doc_id,pos) slivers reach the run decomposition (pos - row_number, no self-join)",
      "q105_audio_stats" -> "audio decode: WAV generation + RIFF parse + one-pass sample stats all inside ONE mapPartitions projection over the scan — zero exchanges; decode cost distributes with the rows, the 100 TB multimodal shape",
      "q107_ann_nprobe_sweep" -> "nprobe sweep: ONE corpus-side cell join + cosine projection at nprobe=8 (queries broadcast), repartition barrier pins the scored candidates, then the 4-setting explode + per-(nprobe,query) windows re-rank the same candidate rows — the sweep never re-touches the corpus",
      "q108_source_quality_rank" -> "per-source quality rank: q100's two-level prefix design per source — within-(source,bucket) row_number on the ONE shared (source,bucket) exchange (scan=1, ReusedExchange for the totals branch), cross-bucket offsets and per-source totals broadcast back from bucket-table-sized aggregates; no per-source global sort",
      "q109_topk_heap_agg" -> "grouped top-k WITHOUT the window sort: bounded-heap TypedImperativeAggregate — partial_topkbyscore absorbs each partition map-side BEFORE the exchange (which then carries <=k rows per (partition, group) as serialized heaps), final merge + posexplode; no WindowExec, no sort larger than k anywhere",
      "q118_audio_fingerprint" -> "audio perceptual near-dup: RIFF/WAVE decode + 64-bit energy-delta fingerprint inside the mapPartitions codec seam (payload bytes never shuffle), then the q117 banded equi-join — pair candidates from 16-bit band equality, never the all-pairs square",
      "q121_hard_negatives" -> "hard-negative mining: query sample BROADCAST against one corpus scan (label-mismatch predicate rides the broadcast nested loop), cosine projection codegen'd, then the bounded-heap aggregate — partial heaps map-side, <=k rows per (partition, query) shuffled, no WindowExec",
      "q123_cdc_chunks" -> "content-defined chunking: O(n) rolling-hash cuts inside the scan projection; the dedup exchanges carry (doc_id, chunk md5) pairs keyed on the hash — chunk text never shuffles past the md5",
      "q125_dup_substring_coverage" -> "repeated-substring coverage (r8): a PROJECTION of q134's fit-once suffix-array span table — the dumped plan is the warm path: span-table checkpoint scan LEFT-joined to per-doc token counts, no gram explode, no text in any exchange; the SA build is paid once per corpus and shared with q134 (plan-identical saCorpus key)",
      "q126_incremental_neardup" -> "incremental near-dup gate: new batch and history each collapse to distinct signatures, band equi-join (never new×history pairs), per-new-doc best match via the bounded-heap top-1 aggregate — partial heaps below the exchange, no WindowExec",
      "q131_bpe_vocab_apply" -> "vocab-scale BPE apply: greedy merge-priority segmentation runs as ONE native expression inside the scan projection (the 1,100-entry merge-rank map rides into codegen as a reference object; per-word cost is hash lookups, independent of |merges|) — zero exchanges, zero HOFs; a 32k-merge vocabulary swaps in at the identical plan",
      "q132_redact_adversarial" -> "adversarial redact fuzz: 12 edge-case templates constructed and scrubbed inside one codegen'd projection (posexplode + the single-pass byte scanners) — same zero-exchange shape as q92, but every \\b/backtracking decision lands on an RE2-divergence-prone fixture the DuckDB oracle re-runs through real regexp machinery",
      "q134_suffix_repeats" -> "suffix-array repeats: the dumped plan is the POST-BUILD span table — a bare scan over the fit-once checkpoint (q50's lineage-truncation signature; the SA is an offline index, built once per corpus). The build itself: prefix-octupling rounds as range-partitioned sorts + partition-local ordinals + per-partition-count offsets (dense rank, no collect, no single-partition stage); adjacency LCP via ONE zip_with pass; span merge a doc-partitioned window — nothing quadratic, nothing corpus-sized at the driver",
      "q135_decontaminate" -> "benchmark decontamination: both sides explode 8-gram md5s in-scan (gram TEXT never leaves the scan); the benchmark's distinct-gram set BROADCASTS into a left-semi probe of the streaming training side — the only exchange is the per-doc hit rollup; no gram-keyed corpus shuffle anywhere",
      "q136_ngram_perplexity" -> "bigram-LM perplexity, ONLINE path (r9): the count tables are fit-once trained state (NgramLm.cachedBigram, shared with q151) — the dumped plan is scoring only: one explode + sized model joins (broadcast under the pair threshold, per-distinct-pair SHUFFLE_HASH at scale) + the per-doc aggregate; V is a literal; the tercile total rides the rank's own bucket table (no separate count job); the tercile cut is the q100 two-level integer-unit rank, no corpus-wide sort and no float percentile boundary",
      "q137_dsir_weights" -> "DSIR importance weights, ONLINE path (r9): the 4096-row log-ratio table is fit-once trained state (NgramLm.cachedDsir) that BROADCASTS into the score join over one hashed-bigram explode — the per-doc aggregate rides the scan's doc_id clustering (zero added corpus exchanges); selection = the two-level integer-unit rank (desc via negated units) with the total from the rank's own bucket table",
      "q138_unigram_viterbi" -> "unigram-LM tokenizer: the plan is ONE scan + the native Viterbi expression (zero exchanges at apply time — the inventory rides into codegen as a reference object via the fit-once cache); the dumped plan is the ONLINE path, proving training jobs don't re-run per execution",
      "q139_blocklist_scan" -> "Aho-Corasick blocklist: one scan + the compiled automaton as a codegen reference object — O(n + matches) per doc independent of pattern count, zero exchanges; the quadratic per-pattern alternative (|patterns| regex passes) never appears in any plan",
      "q141_quality_auc" -> "exact AUC: groupBy(6dp score) collapses the corpus to a VALUE-RANGE-bounded distinct-score table before the cumulative window (so the one unpartitioned window is over <=1e6+1 rows regardless of corpus size); all rank math is integer 2-midrank — the dumped plan shows partial aggregation below the score exchange and a 1-row final total",
      "q142_calibration" -> "calibration table: integer decile bins in the scan projection, ONE partial-aggregated groupBy to <=10 rows — reliability of a 100 TB classifier costs one scan and a 10-row exchange",
      "q143_corpus_rollup" -> "corpus report: ROLLUP's Expand replicates rows per grouping set BEFORE the partial aggregate — all three grains from one scan, exchange carries |groups| rows per grain, never the corpus",
      "q144_stratified_sample" -> "fixed-k-per-stratum sampling: deterministic md5 priority in the scan projection, then the q109 bounded-heap aggregate per stratum — partial_topkbyscore absorbs each partition BEFORE the exchange (≤k rows per (partition, stratum) as serialized heaps), no WindowExec, no global sort",
      "q145_jpeg_phash" -> "JPEG perceptual near-dup: baseline-JFIF encode + full decode (Huffman, dequant, IDCT, 4:2:0 upsample, YCbCr->RGB) + 72x64->9x8 resample + dHash ALL inside the mapPartitions codec seam — payload bytes never shuffle, only 16-char hashes reach the q117 banded equi-join; decode cost distributes with the rows, the 100 TB multimodal shape",
      "q146_dedup_clean" -> "exact-substring span removal (Lee et al.'s actual dedup step): the fit-once SA span LIST aggregates to a per-doc sliver that BROADCASTS into the corpus scan; the cut is an index-filter HOF in the projection — one corpus scan, zero corpus shuffles, and the digest pins the exact surviving token sequence",
      "q147_warc_segment" -> "crawl-layer WARC segmentation: container assembly is generator scaffolding (one grouping exchange); the operator under test — the record walk (version line -> named fields -> Content-Length block -> HTTP parse) — is partition-local mapPartitions, payload bytes never shuffle, and production swaps in binaryFile scans of real *.warc with the parser unchanged",
      "q148_html_extract" -> "HTML main-content extraction: page render and the one-pass extractor (title, <p> content, entity decode, link-density stats, chrome/script rejection) are both per-row map stages — the only exchange is the shared scan-spread repartition, extraction adds none; only extracted text moves downstream, the 100 TB boilerplate-removal shape",
      "q149_url_canonical" -> "URL canonicalization: three wire spellings per doc posexplode out of codegen'd column concat (no Encoder round-trip), the RFC 3986 normalizer is a per-row native expression, and the only post-spread exchange is the canonical-keyed groupBy over URL-sized rows — crawl-identity dedup never moves page content",
      "q150_crawl_pipeline" -> "crawl capstone in ONE plan: render -> WARC assembly (exchange 1) -> partition-local byte-walk parse -> native extract -> per-source rollup (exchange 2, counter-sized partial aggs below it); page bytes never shuffle after assembly and no stage joins",
      "q151_kneser_ney" -> "Kneser-Ney bigram LM, ONLINE path (r9): q136's fit-once model SHARED (one cache entry serves both queries); scoring is one explode + sized model joins + the per-doc aggregate, and short docs ride a null-lp sentinel row through the same aggregate — no corpus-table tail join anywhere in the plan; totals are literals",
      "q152_warc_gz_segment" -> "gzip WARC segmentation (the Common Crawl delivery format): q147's plan with member-wise inflation added INSIDE the partition-local walk — same single assembly exchange, same mapPartitions seam, compressed bytes never shuffle; offsets index the inflated stream so the arithmetic oracle is q147's verbatim",
      "q153_robots_screen" -> "robots.txt crawl screening (RFC 9309): per-host rule parse is host-bounded (one RobotsRules expression row per source), the rule table BROADCASTS, and the longest-match decision is a native glob walk in the scan projection — no regex compilation, URLs never shuffle; frontier screening at 100 TB is one scan plus a host-table broadcast",
      "q154_ingest_datacard" -> "crawl-ingest datacard: q147's partition-local record walk (bodies never shuffle) + a counter-sized partial-aggregated rollup keyed on (status, Content-Type, resolved charset) — the exchange carries |status x type x charset| rows; the charset-resolution policy (declared param wins, strict-UTF-8 default, latin-1 fallback) is under the oracle here, not just specs",
      "q155_sitemap_frontier" -> "sitemap frontier: per-host XML assembly is generator scaffolding (one host-bounded grouping exchange); the SitemapEntries parse is one native expression row per HOST, entries explode to URL-sized rows, and the frontier diff is a loc-keyed left join — page content appears nowhere in the plan",
      "q156_curation_capstone" -> "LM-curation capstone: three corpus branches — bigram scoring + DSIR scoring against the SHARED fit-once models (the dumped plan is the zero-fit warm path: driver-local model relations broadcast into both scorers) and the fingerprint survivor window — joined on doc_id-sized slivers into a |buckets x 2|-row rollup; the keep decision is projection arithmetic and no branch moves text past its md5")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by graft.DevPlans)\n\n")
    sb.append("Representative `.explain(\"formatted\")` output at sf0.01, AQE off\n")
    sb.append("to show whole-stage-codegen boundaries (`*(n)` spans). Regenerate\n")
    sb.append("with `sbt \"runMain graft.DevPlans\"` after plan-affecting changes.\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("WROTE PLANS.md")
    spark.stop()
  }
}
