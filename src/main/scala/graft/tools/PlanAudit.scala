package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit artifact: dump `.explain("formatted")` for the
  * queries whose plan shape carries the 100 TB argument, so a reviewer
  * can see the pushed filters / broadcasts / partial aggregates / codegen
  * spans without re-deriving them.
  *
  * Usage: `sbt -error "runMain graft.tools.PlanAudit [sfDir]" > PLANS.md`
  * (`-error` keeps sbt's [info] log lines out of the artifact).
  *
  * NOTE: plan shapes DEPEND on the sf dir's file-size statistics — join
  * strategy in particular (a dim over the autoBroadcastJoinThreshold
  * flips BroadcastHashJoin to SortMergeJoin). Audit against sf0.001,
  * where dims sit under the threshold exactly as production dims
  * (nation/region/centroids) would on a real cluster.
  */
object PlanAudit {

  /** (query, what the plan must show). */
  val audited: Seq[(String, String)] = Seq(
    "qa1_grouped_agg" -> ("partial_ + final HashAggregate around one Exchange; " +
      "the shipdate filter pushed to the parquet scan"),
    "qj1_join_broadcast" -> "BroadcastHashJoin on the nation dim -- no shuffle of the fact side for the join",
    "qx1_asof_join" -> ("max_by aggregation form: partial aggregate combines candidates " +
      "map-side BEFORE the shuffle (the windowed form would shuffle every joined candidate)"),
    "ql4_cosine_topk" -> "ObjectHashAggregate partial_+final for TopKBySim -- <=k rows per map task enter the shuffle",
    "ql11_ann_topk" -> ("LSH bucket join (corpus scan pruned to matching buckets, queries broadcast), " +
      "then partial_topkbysim + final around ONE k-bounded Exchange; embeddings projected away " +
      "before the aggregate -- no ArrayType(Float) column in any shuffle, no dedup Exchange " +
      "(the aggregate buffer dedups candidate ids)"),
    "ql12_ivf_topk" -> ("nearest-centroid bucket join (nprobe/k scan cut, centroid matrix an expression " +
      "field), then the same partial_topkbysim bounded tail as ql11 -- one k-bounded Exchange, " +
      "embeddings never shuffled"),
    "ql6_minhash_candidates" -> ("band-hash equi-join (no cross join anywhere); fused " +
      "MinHashSignature over the native tokens_ws projection; banding is the fused " +
      "band_hashes array projection (r22 -- one loop per doc, replacing bands " +
      "interpreted xxhash64-over-slice lambdas); pair dedup is the LOCAL " +
      "first_equal_slot filter over the CARRIED band-hash arrays (r22 -- O(bands) " +
      "compares per collision row, replacing r21's minhash_first_band re-hash of both " +
      "full signatures) -- the old (doc_a, doc_b) dropDuplicates Exchange + two " +
      "HashAggregates over every collision row remain GONE from the uncapped plan " +
      "(runtime-pinned in LlmSpec; the capped path keeps the narrow dedup Exchange)"),
    "ql19_decontaminate" -> "benchmark grams broadcast -- corpus side joins with no Exchange before the join",
    "ql15_hash_sample" -> ("pure hash filter riding the parquet scan inside one WholeStageCodegen " +
      "span -- no shuffle, no extra job (the sample is a projection-time predicate)"),
    "ql16_jaccard_pairs" -> ("inverted-index shape: explode -> df-cut semi join (CollectMetrics " +
      "observes dropped-shingle counts at zero plan cost) -> shingle equi-join -> ONE partial+final " +
      "count Exchange per pair -- no cross join; the df-cut agg also feeds the observability metric"),
    "ql21_token_shards" -> ("global prefix sum WITHOUT a global window: Window partitioned by the " +
      "quantile-bucket id (parallel, Exchange on _pid) + a broadcast offsets join -- no " +
      "single-partition Sort/Window anywhere"),
    "ql22_mix_budget" -> ("per-GROUP prefix sum without per-group serialization: corpus Window " +
      "partitioned by (lang, _mix_b hash bucket) -- a 5-language mix still fans across " +
      "languages x buckets partitions; bucket offsets come from a window over the TINY " +
      "per-bucket totals aggregate, broadcast back; no driver collect"),
    "qp1_transform" -> "pure projection inside one WholeStageCodegen span over the scan",
    "ql24_normalize" -> ("whole normalization battery (nfc_normalize + regexp chain + trim) " +
      "riding the scan inside one WholeStageCodegen span -- no shuffle, no UDF"),
    "ql25_tfidf" -> ("(doc, term, tf) rows come straight off the scan via the fused " +
      "explode_term_counts generator (per-doc counts need NO shuffle -- the relational " +
      "form's (doc,term) agg Exchange is gone); df is a COUNT window over ONE term " +
      "Exchange (no separate df agg + join); scalar N as a BroadcastNestedLoopJoin of a " +
      "1-row aggregate (never a driver collect); rank <= m prunes MAP-SIDE via " +
      "WindowGroupLimit BEFORE the per-doc window's Exchange, so at most m rows per " +
      "(partition, doc) shuffle"),
    "ql27_quantized_topk" -> ("quantize projections feed an integer-cosine scored cross join " +
      "(queries broadcast), then the same partial_topkbysim bounded tail as ql4/ql11 -- " +
      "no float OR int8 array column in any Exchange"),
    "ql65_pq_topk" -> ("PQ-ADC: the corpus side is a 16-byte-code projection riding its scan, " +
      "queries broadcast their per-query ADC tables (computed ONCE each, never per pair), " +
      "the scored cross join is m adds + lookups per pair, then the partial_topkbysim " +
      "bounded tail -- neither embeddings nor codes in any shuffle Exchange"),
    "ql66_ivfpq_topk" -> ("IVFPQ, the composed FAISS serving layout: corpus projects " +
      "(id, nearest_centroids bucket, 16-byte code) riding its scan; queries broadcast " +
      "(ADC tables, exploded probe buckets) so the bucket equi-join prunes candidates " +
      "to nprobe/k of the corpus BEFORE any ADC scoring; then the partial_topkbysim " +
      "bounded tail -- neither embeddings nor codes in any shuffle Exchange"),
    "ql67b_bm25_serve" -> ("BM25 SERVING path: postings and stats read from the " +
      "persisted bucketed index -- narrow (term, id, tf, dl) parquet, document text " +
      "never read and never re-tokenized (the term-count generator is FORBIDDEN in " +
      "this plan -- its absence is the machine proof); query vocabulary broadcasts to " +
      "prune posting lists at the scan, df partial-combines over the pruned postings, " +
      "contributions broadcast-join and aggregate on (query, doc), rank window prunes " +
      "map-side -- the build-once/serve-many half of ql67, priced separately"),
    "ql67_bm25_topk" -> ("BM25 sparse retrieval: postings (did, dl, term, tf) ride the " +
      "corpus scan via the fused term-count generator (document text never enters an " +
      "Exchange), a broadcast semi-join against the DISTINCT query vocabulary prunes " +
      "posting lists BEFORE anything shuffles, df is a PARTIAL-COMBINING count agg " +
      "over the pruned postings broadcast back (NOT a term window -- a stopword query " +
      "term would make that a single-task hot partition at corpus scale; the combine " +
      "ships one partial count per task per term), queries fan out by a second " +
      "broadcast join, DECIMAL contributions aggregate on (query, doc), and the " +
      "per-query rank window prunes map-side (WindowGroupLimit) -- three " +
      "column-pruned corpus scans (postings, the df branch, the scalar N/sum_dl agg), " +
      "zero corpus-sized shuffles, no single-task partition anywhere"),
    "ql68_dsir_select" -> ("DSIR selection: positions explode ONCE off the raw scan and " +
      "probe FOUR broadcast model dims (target/raw x bigram/unigram, LeftOuter) -- " +
      "running lmScore twice would rescan the corpus and pay an (id)-keyed join of two " +
      "corpus-sized score frames; both log-prob sums partial-combine in ONE (doc) " +
      "aggregation Exchange, the Gumbel key is a scan-riding projection off the " +
      "closed-form hash draw, and the top-n tail is a map-side-bounded " +
      "TakeOrderedAndProject. The model-estimation subtrees print 13 static scans " +
      "that AQE dedupes at runtime (the machine-checked ql54 stage-dedup behavior " +
      "they inherit -- same lmEstimate construction)"),
    "ql69_weighted_sample" -> ("Efraimidis-Spirakis per-group sampling: the Gumbel key " +
      "(log10 weight + closed-form hash noise) is a scan-riding projection -- ONE scan, " +
      "the only Exchange is the rank window's group partitioning, and WindowGroupLimit " +
      "prunes every task to nPerGroup rows before the shuffle"),
    "ql70_collocations" -> ("PMI collocations: bigram and unigram counts are " +
      "map-side-combinable aggs over scan-riding generators (the corpus never " +
      "shuffles -- only vocabulary-sized count tables do), the minCount cut prunes " +
      "the bigram table BEFORE its two unigram joins, totals broadcast, and the " +
      "top-K tail is a bounded TakeOrderedAndProject"),
    "qm4_frame_sample" -> ("byte-level frame sampling: the fixture container builds in a " +
      "scan-riding projection, frame indices explode from a bounded sequence, and each " +
      "frame is a substring slice INSIDE the Generate stage -- zero shuffles beyond the " +
      "harness ORDER BY, and the container bytes never enter an Exchange (the slice " +
      "projects before anything wide could shuffle)"),
    "qm8_video_neardup" -> ("video near-dup by shared perceptual frames: the real demux " +
      "recovers raw-DIB frames inside the mapPartitions boundary, dhash64 rides the " +
      "slice projection (container bytes never in an Exchange -- typed gate), the " +
      "banded self-join keys 8-byte (band, slice) rows at VIDEO level (never " +
      "all-pairs, same-video frames never pair), and the distinct-frame-pair count " +
      "is ONE partial-combining collect_set agg keyed on the video pair (set state " +
      "bounded by the frame cap) -- the r17 dropDuplicates+groupBy tail paid a " +
      "second Exchange for the same answer (VERDICT r17 What's-wrong #4, closed)"),
    "qm9_audio_neardup" -> ("audio near-dup by shared SEGMENT hashes (the qm8 recipe on " +
      "the time axis): the RIFF parse runs inside the mapPartitions codec boundary, " +
      "window slicing is a Generate+substring projection riding the scan (PCM bytes " +
      "never in an Exchange -- typed gate), audiohash64 is codegen'd per window, the " +
      "banded self-join keys 8-byte (band, slice) rows at CLIP level, and the " +
      "distinct-segment-pair count is the same ONE collect_set agg as qm8"),
    "qm10_image_tile_neardup" -> ("image near-dup by shared TILE hashes (the qm8 recipe " +
      "on the SPATIAL axis -- crop-robust matching): tile slicing is a Generate + the " +
      "codegen'd grid_tile projection riding the scan (round 21 replaced the interpreted " +
      "aggregate-of-substrings HOF; the gray grid never in an " +
      "Exchange -- typed gate), dhash64 is codegen'd per 18x16 tile, the banded " +
      "self-join keys 8-byte (band, slice) rows at IMAGE level (same-image tiles " +
      "never pair), and the distinct-tile-pair count is the same ONE collect_set " +
      "agg as qm8/qm9"),
    "qm13_image_tile_strided" -> ("strided tile near-dup (hop < tile): the qm10 plan " +
      "family verbatim -- per-tile dHash rides the scan as a Generate + the codegen'd " +
      "grid_tile projection (origins now hop-strided, 9 tiles/image vs " +
      "4 -- the priced row growth), banded ShuffledHashJoin sides + ONE " +
      "partial-combining collect_set pair agg; the gray grid never in an Exchange"),
    "qm12_resize_gray" -> ("exact integer area-average resize: the grid synthesizes in a " +
      "scan-riding projection, resize_gray + dhash64 are codegen'd expressions in the " +
      "same projection (gray bytes never in an Exchange -- the typed gate), and the only " +
      "Exchange is the harness ORDER BY -- the normalize-before-embed step costs one scan"),
    "qm11_video_soundtrack_neardup" -> ("video near-dup by SOUNDTRACK (the cross-modal " +
      "axis): the two-stream AVI fixture builds in a scan-riding projection, the hdrl " +
      "stream-table walk + wb-span concatenation + PCM downmix run inside the " +
      "mapPartitions codec boundary (container bytes never in an Exchange -- typed " +
      "gate), window slicing/audiohash64/banded join are qm9's chain verbatim, and " +
      "the distinct-segment-pair count is the same ONE collect_set agg"),
    "qm14_audio_rate_neardup" -> ("RATE-NORMALIZED audio near-dup: the two-rate WAV " +
      "fixture builds in a scan-riding projection, the RIFF parse runs inside the " +
      "mapPartitions codec boundary, resample_pcm is a codegen'd expression in the " +
      "same scan-side projection as the window substrings (the 2:1 resample of every " +
      "master costs one pass over its PCM, no extra stage; the window count " +
      "derives arithmetically from the input length, and round 21 moved the validity " +
      "filter onto INPUT columns -- ADVICE r20 #3: the old `_pcm IS NOT NULL` form " +
      "was substituted into the pushed-down predicate, so the plan evaluated " +
      "resample_pcm in the Filter AND the Project; the executed plan now shows " +
      "exactly ONE resample_pcm), PCM bytes never in an Exchange (typed gate), and the " +
      "banded join + distinct-segment-pair agg are qm9's chain verbatim"),
    "qm15_resize_rgb" -> ("exact integer RGB resize: the interleaved grid synthesizes " +
      "in a scan-riding projection, both resize_rgb targets are codegen'd expressions " +
      "in the same projection (RGB bytes never in an Exchange -- the typed gate), and " +
      "the only Exchange is the harness ORDER BY -- the qm12 plan with three channels " +
      "riding one kernel"),
    "qm16_video_tile_neardup" -> ("crop-robust video near-dup (frame x tile): the " +
      "two-frame AVI fixture builds in a scan-riding projection, demux + ragged slice " +
      "run inside the codec boundary, per-frame tiling is the qm10/qm13 Generate + " +
      "codegen'd grid_tile projection keyed by the (video, frame) composite " +
      "struct (frame bytes never in an Exchange -- typed gate), composite positions " +
      "are a codegen'd long projection, and the banded ShuffledHashJoin + ONE " +
      "partial-combining collect_set pair agg are the qm10 tail verbatim"),
    "qm17_pooled_embedding" -> ("in-engine pooled image embedding: the interleaved grid " +
      "synthesizes, resize_rgb runs, and the strided-mean pooling computes -- all three " +
      "codegen'd native expressions in ONE scan-riding projection (round 21 replaced the " +
      "interpreted conv(substr(hex)) HOF pooling with pooled_features_rgb: all dim " +
      "strided sums in one byte-array pass -- VERDICT r20 watch #2 closed; the r20 " +
      "lambda-binding trick that stopped the resize re-evaluating per stripe is " +
      "superseded); RGB bytes never in an Exchange (typed gate), the " +
      "feature explode is one Generate, and the only Exchange is the harness ORDER BY " +
      "over narrow (id, idx, feature) rows"),
    "qm7_avi_demux" -> ("REAL AVI container demux: the fixture container (LIST nesting, " +
      "word pads, little-endian sizes) builds in a scan-riding projection, the RIFF " +
      "walker recovers frame spans inside the mapPartitions boundary, and the sampled " +
      "frames slice out in the same Generate+substring plan as qm5 -- one scan, zero " +
      "shuffles beyond the harness ORDER BY, container bytes never in an Exchange"),
    "qm6_audio_fingerprint" -> ("REAL WAV decode + energy-envelope fingerprint: the " +
      "fixture WAV builds in a scan-riding projection (constant-header binary literal + " +
      "the codegen'd synth_pcm16 -- round 21 replaced the interpreted per-sample HOF " +
      "hex), the RIFF parser runs inside the mapPartitions codec boundary (audio bytes " +
      "never enter an Exchange), and audiohash64 is a codegen'd unary expression over " +
      "the mono PCM -- one scan, zero shuffles beyond the harness ORDER BY"),
    "qm5_frame_sample_ragged" -> ("RAGGED frame sampling (per-frame offset/length index, " +
      "the real-extractor shape): identical plan family to qm4 -- the sampled index " +
      "explodes in a Generate, each frame is an element_at + substring projection riding " +
      "the scan, the span guards are when/raise_error expressions in the same projection, " +
      "zero shuffles beyond the harness ORDER BY, container bytes never enter an Exchange"),
    "qx10_profile" -> ("counts/nulls/min/max ride ONE HashAggregate pass over ONE scan; " +
      "each exact count_distinct is its own NARROW column-pruned aggregation " +
      "broadcast-crossjoined onto the base row (r22 -- the shared-agg form's Expand " +
      "multiplied every row 5x and shuffled 111 MB of wide null-padded partial rows " +
      "for a 10 MB input; per-column aggs shuffle only each column's distinct values), " +
      "then a generate/explode of the 1-row result -- no Expand anywhere, no driver loop"),
    "ql28_token_chunks" -> ("Generate (explode) directly over the scan projection -- chunks are " +
      "slices of one token array; the ONLY Exchange is the harness's total ORDER BY " +
      "(rangepartitioning), none in the operator itself"),
    "ql29_boilerplate" -> ("line explode -> 16-byte md5-keyed df agg -> LEFT ANTI join -> ordered " +
      "reassembly agg: partial+final around each Exchange, keys are hashes not line text, " +
      "no corpus-wide window"),
    "ql30_ivf_neardup" -> ("within-cell candidate equi-self-join on the IVF bucket key " +
      "(cells corpus-proportional -- never an all-pairs join), exact cosine scored " +
      "in-join, narrow (doc_a, doc_b) dedup"),
    "ql32_neardup_autoplanes" -> ("multi-table banded hyperplane self-join: per table one equi-join " +
      "on the 8-byte bucket key (corpus-sized planes -- NEVER an all-pairs join), exact cosine " +
      "scored in-join, narrow (doc_a, doc_b, sim) union + dedup -- no embedding in the dedup Exchange"),
    "ql33_knn_graph" -> ("the exact corpus-vs-corpus baseline: cartesian scoring (documented O(n^2) " +
      "exactness tool) collapsed straight into the partial_topkbysim bounded tail -- the ONLY " +
      "Exchange after scoring carries <=k narrow rows per query; the streamed side round-robins " +
      "across the session's shuffle lanes BEFORE the blowup (r21: a one-file corpus otherwise " +
      "ran the n^2 work on 1-2 scan partitions and tripped the partial agg's >128-group sort " +
      "fallback -- O(n) exchange to parallelize O(n^2) compute)"),
    "ql34_knn_descent" -> ("NN-Descent build: auto-planes bucket init joins, then per-iteration " +
      "id-only 2-hop candidate joins + two embedding fetch equi-joins, exact cosine in-join, " +
      "k-bounded partial_topkbysim tails -- per-iteration work O(n*buildK^2*dim), nothing O(n^2)"),
    "ql35_repeated_spans" -> ("window explode -> 16-byte md5 span-df agg (partial+final) -> " +
      "hot span STARTS collect to one small int list per affected doc (the only token-derived " +
      "rows in any Exchange) -> fused remove_spans difference-array coverage + reassembly " +
      "riding the scan projection -- no corpus-token shuffle, no per-doc window"),
    "ql71_crossdoc_spans" -> ("the ql35 shape with the keep-first cut: window explode -> " +
      "16-byte md5 agg computing min/max doc id per gram (ONE partial-combining agg, " +
      "deliberately not count-distinct -- no Expand) -> non-keeper starts join back on the " +
      "16-byte hash -> same fused remove_spans coverage; occurrences never pair, so no " +
      "hot-gram quadratic blowup is possible (total work O(spanTokens x corpus tokens))"),
    "ql37_gopher_flags" -> ("the whole rule battery is ONE fused native expression " +
      "(gopher_text_flags, real codegen -- r21: the HOF form paid interpreted lambdas plus a " +
      "regex Matcher per token) riding the scan in one WholeStageCodegen span -- " +
      "integer-arithmetic comparisons, no shuffle in the operator " +
      "(the only Exchange is the harness ORDER BY)"),
    "ql38_linear_score" -> ("exploded tokens BroadcastHashJoin the weights dim (never a map " +
      "literal in the plan), DECIMAL partial+final sum per doc -- one narrow Exchange keyed by id"),
    "ql43_lm_score" -> ("exploded (context, token) position pairs BroadcastHashJoin the LM dim " +
      "TWICE (bigram on the pair, unigram on the token -- both broadcast, never a literal), " +
      "DECIMAL partial+final sum per doc -- one narrow Exchange keyed by id, text never shuffled"),
    "ql44_domain_stats" -> ("domain projection riding the scan, LEFT ANTI BroadcastHashJoin " +
      "against the blocklist dim (no shuffle to subtract), then ONE partial+final hash agg on " +
      "the bounded domain key -- the only Exchange carries (domain, counts) rows"),
    "qx12_jsonl_roundtrip" -> ("json scan with the EXPLICIT schema (no inference scan) + " +
      "corrupt-record projection -- the parse rides the file scan in one span; no shuffle " +
      "in the operator (the only Exchange is the harness ORDER BY)"),
    "ql45_gopher_repetition" -> ("n-gram battery is ONE fused native expression " +
      "(gopher_gram_stats, real codegen) riding the scan -- zero shuffle for grams; " +
      "lines/paragraphs come from the native lines_nonempty/paras_nonempty expressions " +
      "(r21, replacing interpreted split+trim+filter HOFs), then explode + hash-agg on " +
      "(doc, md5(item)) so document text never shuffles, and their tiny per-doc stats " +
      "BROADCAST back to the gram projection"),
    "ql46_pii_redact" -> ("four codegen'd regex passes riding the scan in ONE " +
      "WholeStageCodegen span -- no shuffle in the operator (the only Exchange is the " +
      "harness ORDER BY)"),
    "ql47_percentile_buckets" -> ("score rides the scan; ONE sort Exchange partitioned by " +
      "lang for the exact rank window (the documented skew boundary -- the approx form " +
      "replaces it with a broadcast cuts dim); bucket cuts are integer arithmetic"),
    "ql48_c4_filters" -> ("line battery is the native c4_clean_lines expression (r21: one " +
      "byte pass replacing the nested per-line HOF battery) + page flags as pure column " +
      "expressions riding the scan -- no shuffle in the operator (the only Exchange is the " +
      "harness ORDER BY)"),
    "ql49_pack_sequences" -> ("two-phase prefix sum: per-bucket windows in parallel " +
      "(bucket ids are literal quantile cuts), driver-side running sum over <=32 bucket " +
      "totals broadcast back -- NO single-task global window; span explode is bounded " +
      "by n/seqLen + 1 rows per doc"),
    "ql50_pretrain_pipeline" -> ("the composed recipe: scan-riding gate batteries over " +
      "the full corpus close at ONE persisted boundary (InMemoryTableScan below every " +
      "downstream branch); banded LSH self-join, cluster joins and the bucket window all " +
      "read the cached survivors, never the raw scan"),
    "ql47b_percentile_buckets_approx" -> ("the skew-free bucket form: ONE " +
      "approx_percentile ObjectHashAggregate (partial+final) per group over one scan, " +
      "cuts broadcast back (BroadcastHashJoin, null-safe key) -- NO per-language sort " +
      "Exchange anywhere; the bucket compare is a scan-riding projection"),
    "ql51_winnowing" -> ("fused winnowing_fingerprint expression (one pass, monotonic " +
      "deque, real codegen) riding the scan -- no shuffle in the operator (the only " +
      "Exchange is the harness ORDER BY)"),
    "ql52_simhash_candidates" -> ("one-hash-per-token fused simhash_bits projection " +
      "riding the scan; fused band_hashes over the bit vector posexplodes to narrow " +
      "(id, bha, band, bh) rows, band equi-self-join -- never all-pairs; pair dedup is " +
      "the LOCAL first_equal_slot filter over the carried band-hash arrays (r22 -- the " +
      "dropDuplicates Exchange over collision rows is gone from the uncapped plan); " +
      "only narrow pair rows reach any Exchange"),
    "ql53_ngram_jaccard" -> ("shingle-id minhash signatures (banding at the SAME " +
      "granularity the rescore measures), band equi-self-join to narrow candidate pairs, " +
      "then the exact-Jaccard rescore joins shingle-ID arrays (8-byte ids, never shingle " +
      "strings) onto candidates only -- candidate volume tracks output volume by design"),
    // round-11 coverage completion: every benched query carries an
    // expected-shape line so BENCH regressions can be plan-diffed
    "qc1_sequence" -> ("lazy stage fold composes into ONE plan: filter+projection ride the " +
      "scan in a single WholeStageCodegen span -- no per-stage materialization or shuffle"),
    "qc2_concurrent" -> ("branches share the SAME persisted input (one InMemoryTableScan per " +
      "branch, the scan runs once) and union narrow branch results -- no recompute per branch"),
    "qj2_join_3way" -> ("two BroadcastHashJoins chained (nation, region dims) -- the customer " +
      "fact side flows through both joins without a single Exchange"),
    "qj3_semi" -> "BroadcastHashJoin LeftSemi on the dim -- fact side never shuffles, dim never duplicates rows",
    "qj3_anti" -> "BroadcastHashJoin LeftAnti on the dim -- same no-fact-shuffle shape as the semi",
    "qj4_range_join" -> ("equi-join on partkey with the quantity>size range predicate as an " +
      "in-join residual (broadcast part dim) -- the range never degrades to a nested loop " +
      "over the fact side; partial+final count agg above"),
    "qj5_bloom_join" -> ("might_contain filter on the fact scan BEFORE its Exchange (bloom " +
      "built from the selective dim side) -- non-matching fact rows never shuffle"),
    "ql13_ngram_terms" -> ("Generate (explode_ngrams custom generator) directly over the scan " +
      "projection, then ONE partial+final count agg on the gram key -- text never shuffles, " +
      "gram keys do"),
    "qa2_count_distinct" -> ("exact distinct via two-phase agg (partial on (group, value), " +
      "final count) -- no corpus-wide dropDuplicates shuffle beyond the keyed Exchange"),
    "qa3_rollup" -> "Expand feeds ONE partial+final HashAggregate pair -- rollup grouping sets share a single Exchange",
    "qw1_rank_window" -> ("rank window partitioned by the group key (Exchange on the key, " +
      "in-partition sort) -- no global sort; WindowGroupLimit prunes map-side where the " +
      "filter permits"),
    "qw2_running_sum" -> ("running-sum window partitioned by key ordered by date -- ONE " +
      "Exchange on the key; no single-partition global window"),
    "qs1_topk" -> ("TakeOrderedAndProject (limit+sort fused) -- per-partition top-k then a " +
      "single reduced merge; never a full global sort of the input"),
    "qu1_intersect" -> ("INTERSECT as BroadcastHashJoin LeftSemi + ONE partial+final distinct " +
      "agg -- the probe side never shuffles for the join, no cross join"),
    "qu1_except" -> "EXCEPT as the LeftAnti analog of qu1_intersect -- same broadcast + single-distinct-Exchange shape",
    "qf1_scalars" -> "whole scalar battery rides the scan in one WholeStageCodegen span -- only the harness ORDER BY shuffles",
    "qf2_dates" -> "date battery rides the scan in one WholeStageCodegen span -- only the harness ORDER BY shuffles",
    "qt1_tumbling" -> ("window(ts) bucketing is a scan-riding projection; ONE partial+final " +
      "agg on (window, key) -- the streaming twin adds only watermark state"),
    "qt2_session" -> ("session_window merge: Exchange on user_id + in-partition sort, " +
      "MergingSessions aggregation -- per-user state, no global sort"),
    "qt3_sliding" -> ("sliding window explodes each event into window buckets on the scan, " +
      "then ONE partial+final agg on (window, key)"),
    "qt5_first_seen" -> ("struct-min first-row-per-key: partial+final SortAggregate around " +
      "ONE keyed Exchange (struct ordering is not hash-aggregable -- the sorts are per map " +
      "partition, and the partial agg still sends <=1 row per key per task into the " +
      "shuffle); no corpus-wide row_number window"),
    "ql1_exact_dedup" -> ("md5-keyed dedup agg (partial+final on the 16-byte hash) feeding " +
      "the distribution agg -- document text never shuffles, hashes do"),
    "ql2_text_stats" -> "per-doc stats are scan-riding projections -- only the harness ORDER BY shuffles",
    "ql3_top_terms" -> ("token explode over the scan, partial+final count on the term key, " +
      "TakeOrderedAndProject tail -- no global sort of the term table"),
    "ql5_token_set_dups" -> ("equi-self-join on the 16-byte sorted-token-set md5 key " +
      "(set semantics computed in the scan projection) -- broadcast at audit scale, keyed " +
      "SMJ at fleet scale; token arrays and text never ride the join"),
    "ql7_token_count" -> "fused token counting rides the scan -- only the harness ORDER BY shuffles",
    "ql8_quality" -> "quality score battery rides the scan in one span -- only the harness ORDER BY shuffles",
    "ql9_fingerprint" -> "rolling-hash fingerprint is a scan-riding fused expression -- only the harness ORDER BY shuffles",
    "ql10_langid" -> ("exploded tokens BroadcastHashJoin the weight dim, DECIMAL " +
      "partial+final HashAggregate per (doc, lang), argmax as a struct-min SortAggregate " +
      "pair, then a LeftOuter merge keyed by COLUMN-PRUNED doc ids (ReadSchema = doc_id " +
      "alone) -- text never enters an Exchange"),
    "ql36_url_canonical" -> "canonicalization regex chain rides the scan in one codegen span -- no shuffle in the operator",
    "ql40_bpe_encode" -> ("fused BPE encode expression (vocab as a reference object) riding " +
      "the scan -- no per-token join, no shuffle in the operator"),
    "ql64_bpe_decode" -> ("encode -> decode roundtrip rides the ONE documents scan in a " +
      "single codegen span (both vocabularies are expression reference objects) -- no " +
      "per-id join, no shuffle in the operator, ONE FileScan (probe rows come from Range)"),
    "ql41_linear_bigram" -> ("fused word_ngrams projection feeds the exploded feature x " +
      "broadcast weights join, DECIMAL partial+final per doc -- one narrow Exchange"),
    "ql42_semantic_dedup" -> ("IVF assign rides the scan (centroid matrix in-expression), " +
      "within-cell candidate equi-join (cells corpus-proportional, never all-pairs), " +
      "pointer-jump cluster joins on narrow ids, keep-best argmax agg; round 21: the " +
      "two keep-best survivor joins hint shuffle_hash so the tiny per-cluster " +
      "aggregates build and the full-width rows STREAM -- the default SortMergeJoin " +
      "sorted the wide side twice (2 SMJ -> 2 ShuffledHashJoin, wide Sorts gone)"),
    "qm2_media_fingerprint" -> ("byte-budget repartition: per-partition size stats reduce " +
      "to the driver (bounded rows), then ONE RoundRobin/range Exchange sized by bytes -- " +
      "binary payloads shuffle exactly once"),
    "qx2_cube" -> "CUBE via Expand into ONE partial+final agg pair -- all grouping sets share a single Exchange",
    "qx5_grouping_sets" -> "grouping sets via Expand into ONE partial+final agg pair (the qx2 shape, explicit sets)",
    "ql44b_domain_stats_psl" -> ("psl_domain is a scan-riding native expression (rule dims " +
      "ride the task binary -- no explode/join to match suffixes), then ONE partial+final " +
      "agg on the bounded registrable-domain key"),
    "ql54_lm_estimate" -> ("ONE corpus scan: fused bigram-pair generation rides it into a " +
      "single map-side-combinable bigram-count agg (the only corpus-sized input anywhere, " +
      "Exchange REUSED across branches); context totals, unigram counts and the corpus " +
      "total are vocabulary-sized re-aggregations of that table; the context-total join " +
      "and the token total are broadcasts"),
    "qx13_csv_roundtrip" -> ("text scan + from_csv projection with the EXPLICIT schema " +
      "(no inference scan) -- the parse rides the file scan in one span, splittable at " +
      "any byte offset; no shuffle in the operator (the only Exchange is the harness " +
      "ORDER BY)"),
    "ql55_semantic_decon" -> ("corpus bucketed by a scan-riding IVF assignment, benchmark " +
      "probes BROADCAST (BroadcastHashJoin -- the corpus never shuffles for the probe " +
      "join), exact cosine in-join, and the contaminated ids BROADCAST back for the LEFT " +
      "ANTI (BroadcastHashJoin LeftAnti -- without the hint this planned as a " +
      "SortMergeJoin shuffling the whole corpus, embeddings included)"),
    "ql56_mixture_sample" -> ("rate dim BroadcastHashJoin + scan-riding copy arithmetic + " +
      "a bounded Generate (<= ceil(rate) rows per input row) -- no shuffle in the " +
      "operator (the only Exchange is the harness ORDER BY)"),
    "ql57_ccnet_buckets" -> ("three composed stages, each its own audited shape: lmEstimate's " +
      "vocabulary-sized aggs over the reference slice, the resulting per-language model as " +
      "BROADCAST dims probed by scan-exploded position pairs (text never shuffles), one " +
      "narrow DECIMAL sum Exchange per doc, then the per-language rank window (the " +
      "documented percentileBuckets sort boundary)"),
    "ql58_mean_embedding" -> ("posexplode to (group, pos, v) rides the scan; ONE " +
      "partial+final DECIMAL-sum agg on (group, pos) -- dim rows per group in the " +
      "Exchange, whole embeddings never shuffle; the per-group assembly agg carries dim " +
      "narrow rows"),
    "ql59_sentences" -> ("RE2-alternation extract + trim/filter lambdas + posexplode, all " +
      "riding the scan in one Generate span -- no shuffle in the operator (the only " +
      "Exchange is the harness ORDER BY)"),
    "ql60_nb_train" -> ("one token-explode scan into a map-side-combinable (label, token) " +
      "count agg (the only corpus-sized input); label totals and vocab size are " +
      "vocabulary-sized re-aggregations; doc counts prune to the label column; all label " +
      "dims broadcast onto the count rows"),
    "ql61_nb_classify" -> ("model dims BROADCAST (label metadata + token likelihoods -- " +
      "the corpus never shuffles for either probe); per-label fan-out is |labels|; " +
      "DECIMAL partial+final sum per (doc, label), then the struct-max argmax agg -- " +
      "only narrow (id, label, decimal) rows in any Exchange"),
    "qx14_asof_tolerance" -> ("the qx1 max_by aggregation form with BOTH time bounds as " +
      "in-join residuals -- the lookback predicate cuts candidates before the partial " +
      "aggregate, so the one keyed Exchange still carries <=1 row per (task, left-pk)"),
    "ql62_winnow_pairs" -> ("fused winnowing sketch rides the scan; inverted-index " +
      "equi-self-join on the 8-byte fingerprint (SKETCH-sized input, never corpus " +
      "tokens; never all-pairs), ONE partial+final count Exchange per surviving pair, " +
      "sketch sizes join back narrow -- document text never shuffles"),
    "ql63_url_dedup" -> ("one-pass keep-best: ONE partial-combining max(struct(score, " +
      "-id)) agg over a narrow (curl, score, id) projection + ONE join-back -- the " +
      "canonicalization regex chain runs exactly twice (machine-checked: <=2 corpus " +
      "scans), O(1) per-key agg state, no windows; the agg Exchange carries only " +
      "(curl, score, id)"),
    "ql50b_pretrain_incremental" -> ("the incremental lifecycle; the REGISTRY form is " +
      "checkpoint-collapsed like ql50's (materialize-then-release — the r14 ADVICE " +
      "gate-cache-leak fix), so the shape claims are gated on the LAZY chain in " +
      "PlanShapeSpec: both batches' gate batteries ride their scans to persisted " +
      "cuts, the arriving batch signs ONCE and band-joins the initial corpus's " +
      "index (narrow (id, mh, band, bh) rows — old text never re-enters a join), " +
      "cluster joins on ids, keep-best agg, per-language bucket window over " +
      "survivors — never a cross join anywhere"),
    "qm3_perceptual_neardup" -> ("perceptual near-dup: the fused dhash64 projection " +
      "rides the scan (media bytes exist only INSIDE scan-local expressions -- the " +
      "typed gate pins no binary column in any Exchange), 4-band posexplode to narrow " +
      "(id, hash, band, slice) rows, banded ShuffledHashJoin self-join on the 8-byte " +
      "(band, slice) key -- never all-pairs, never a corpus broadcast; exact Hamming " +
      "scored in-join, only narrow (doc_a, doc_b, hamming) rows reach the dedup " +
      "Exchange; AQE reuses ONE Exchange for both join sides so the decode+hash chain " +
      "computes once (machine-checked in PlanShapeSpec's shuffle_hash family gate)")
  )

  /** Machine-checked subset of the prose claims above: a shuffle budget
    * plus required/forbidden physical operators, asserted by
    * `PlanShapeSpec` over the sf0.001 plans — the audit's English turned
    * into a regression gate (round 11: reading the regenerated plans
    * caught ql55's anti-join silently planning as a corpus-shuffling
    * SortMergeJoin; this spec makes that class of drift a red test).
    * `maxShuffles` counts ShuffleExchange nodes (Broadcast/Reused
    * excluded); scan-riding operators budget exactly 1 — the harness
    * ORDER BY.
    */
  /** `noWideShuffle` adds the TYPED check (executed, AQE-walked): no
    * embedding-array or binary column may ride any ShuffleExchange — the
    * string-level gate can't see column types, and "bytes/embeddings
    * never shuffle" is the load-bearing 100 TB claim for the media and
    * pooling operators.
    */
  final case class Shape(maxShuffles: Int = Int.MaxValue,
                         forbid: Seq[String] = Nil,
                         require: Seq[String] = Nil,
                         maxScans: Int = Int.MaxValue,
                         noWideShuffle: Boolean = false)

  private val bhj = Seq("BroadcastHashJoin")
  private val noSmj = Seq("SortMergeJoin")
  private val noCross = Seq("CartesianProduct")

  val shapes: Map[String, Shape] = Map(
    // "only Exchange is the harness ORDER BY" claims
    "qp1_transform" -> Shape(1),
    "qc1_sequence" -> Shape(1),
    "qf1_scalars" -> Shape(1),
    "qf2_dates" -> Shape(2), // date agg + ORDER BY
    "ql7_token_count" -> Shape(1, require = Seq("tokens_ws")),
    "ql8_quality" -> Shape(1),
    "ql9_fingerprint" -> Shape(1),
    "ql24_normalize" -> Shape(1),
    "ql28_token_chunks" -> Shape(1),
    "ql36_url_canonical" -> Shape(1),
    "ql37_gopher_flags" -> Shape(1, require = Seq("gopher_text_flags")),
    "ql40_bpe_encode" -> Shape(1),
    "ql64_bpe_decode" -> Shape(1, maxScans = 1),
    "ql46_pii_redact" -> Shape(1),
    "ql48_c4_filters" -> Shape(1, require = Seq("c4_clean_lines")),
    "ql51_winnowing" -> Shape(1),
    "qx12_jsonl_roundtrip" -> Shape(1),
    "qx13_csv_roundtrip" -> Shape(1),
    "ql56_mixture_sample" -> Shape(1, forbid = noSmj, require = bhj),
    "ql59_sentences" -> Shape(1),
    // broadcast-dim claims: the fact/corpus side must not shuffle for
    // the join (SMJ would mean both sides Exchange)
    "qj1_join_broadcast" -> Shape(forbid = noSmj, require = bhj),
    "qj3_semi" -> Shape(forbid = noSmj, require = bhj),
    "qj3_anti" -> Shape(forbid = noSmj, require = bhj),
    "ql19_decontaminate" -> Shape(forbid = noSmj, require = bhj),
    "ql38_linear_score" -> Shape(forbid = noSmj, require = bhj),
    "ql41_linear_bigram" -> Shape(forbid = noSmj, require = bhj),
    "ql43_lm_score" -> Shape(forbid = noSmj, require = bhj),
    "ql44_domain_stats" -> Shape(forbid = noSmj, require = bhj),
    "ql55_semantic_decon" -> Shape(forbid = noSmj, require = bhj),
    "ql57_ccnet_buckets" -> Shape(require = bhj),
    // "never all-pairs" claims (exact baselines ql4/ql27/ql33 excluded —
    // their cartesian IS the documented design)
    "ql6_minhash_candidates" -> Shape(forbid = noCross,
      require = Seq("first_equal_slot", "band_hashes", "tokens_ws")),
    "ql11_ann_topk" -> Shape(forbid = noCross),
    "ql12_ivf_topk" -> Shape(forbid = noCross),
    "ql30_ivf_neardup" -> Shape(forbid = noCross),
    "ql32_neardup_autoplanes" -> Shape(forbid = noCross),
    "ql42_semantic_dedup" -> Shape(forbid = noCross),
    "ql52_simhash_candidates" -> Shape(forbid = noCross,
      require = Seq("first_equal_slot", "band_hashes")),
    "ql53_ngram_jaccard" -> Shape(forbid = noCross,
      require = Seq("first_equal_slot", "band_hashes")),
    "ql61_nb_classify" -> Shape(forbid = noSmj, require = bhj),
    "ql62_winnow_pairs" -> Shape(forbid = noCross),
    // one-pass keep-best: the canonicalization chain runs at most twice
    // (winner agg + join-back) — the VERDICT r11 #3 contract
    "ql63_url_dedup" -> Shape(maxScans = 2, forbid = noCross),
    // round-14 extension (VERDICT r13 #5): the remaining prose-only
    // claims with machine-checkable tokens. "Window [" is the window
    // OPERATOR's print form — bare "Window" would also match the
    // WindowGroupLimit pruning node and the window() bucketing function.
    //
    // ql35: hot-span starts + the md5 span-df agg are the ONLY shuffles
    // besides the harness ORDER BY (budget 3); the coverage pass is the
    // fused remove_spans expression, never a per-doc window
    "ql35_repeated_spans" -> Shape(3, forbid = Seq("Window ["),
      require = Seq("remove_spans")),
    // ql71: the ql35 budget + one more keyed Exchange (the non-keeper
    // starts join back on the 16-byte gram hash); still no per-doc
    // window, coverage stays the fused expression
    "ql71_crossdoc_spans" -> Shape(4, forbid = Seq("Window ["),
      require = Seq("remove_spans")),
    // ql58: (group, pos) partial+final + assembly + harness ORDER BY;
    // the typed check pins that whole embeddings never ride an Exchange
    "ql58_mean_embedding" -> Shape(3, require = Seq("partial_sum"),
      noWideShuffle = true),
    // qx14: bounded as-of — the partial max_by combines candidates
    // map-side (<=1 row per key per task into the ONE keyed Exchange);
    // a windowed or sort-merge form would shuffle every candidate
    "qx14_asof_tolerance" -> Shape(2,
      forbid = Seq("Window [", "SortMergeJoin"),
      require = Seq("partial_max_by", "BroadcastHashJoin")),
    // qx1 carries the same claim without the tolerance residual
    "qx1_asof_join" -> Shape(forbid = Seq("Window ["),
      require = Seq("partial_max_by")),
    // qm3: banded 8-byte-key self-join (shuffle_hash, never all-pairs,
    // never a broadcast of the corpus); the fused dhash64 projection and
    // the typed check together pin that media bytes exist only inside
    // scan-riding expressions, never in any Exchange
    "qm3_perceptual_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "dhash64"), noWideShuffle = true),
    // qm8: the video sibling — banded frame-hash self-join at video
    // level; container bytes exist only upstream of the mapPartitions
    // demux, frame hashes are the only wide content (noWideShuffle).
    // Static budget 4 = both band-join sides (they dedupe to ONE reused
    // Exchange at runtime — the family test) + ONE collect_set pair agg
    // + harness ORDER BY. The r17 tail paid 5: the dropDuplicates
    // Exchange is gone (VERDICT r17 What's-wrong #4)
    "qm8_video_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "dhash64", "partial_collect_set"),
      noWideShuffle = true),
    // qm9: the audio axis — same budget: band-join sides + ONE
    // collect_set pair agg + harness ORDER BY; PCM never in an Exchange
    "qm9_audio_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "audiohash64", "partial_collect_set"),
      noWideShuffle = true),
    // qm10: the spatial axis — same budget: band-join sides + ONE
    // collect_set pair agg + harness ORDER BY; the gray grid never in
    // an Exchange
    "qm10_image_tile_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "dhash64", "grid_tile", "partial_collect_set"),
      noWideShuffle = true),
    // qm11: the soundtrack axis — qm9's budget (demux+downmix ride the
    // scan inside the codec boundary; only (id, seg, hash) rows shuffle)
    "qm11_video_soundtrack_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "audiohash64", "partial_collect_set"),
      noWideShuffle = true),
    // qm12: a pure scan-riding projection — the harness sort is the
    // only Exchange; both media expressions stay in the projection
    "qm12_resize_gray" -> Shape(1, forbid = noCross ++ noSmj,
      require = Seq("resize_gray", "dhash64"),
      noWideShuffle = true),
    // qm13: the qm10 budget with strided origins — band-join sides +
    // ONE collect_set pair agg + harness ORDER BY
    "qm13_image_tile_strided" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "dhash64", "grid_tile", "partial_collect_set"),
      noWideShuffle = true),
    // qm14: the qm9 budget with the resample riding the decode stage —
    // band-join sides + ONE collect_set pair agg + harness ORDER BY;
    // resample_pcm must sit in the projection, PCM never in an Exchange
    "qm14_audio_rate_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "audiohash64", "resample_pcm",
        "partial_collect_set"),
      noWideShuffle = true),
    // qm15: the qm12 budget — one scan-riding projection holding both
    // resize_rgb targets; the harness sort is the only Exchange
    "qm15_resize_rgb" -> Shape(1, forbid = noCross ++ noSmj,
      require = Seq("resize_rgb"),
      noWideShuffle = true),
    // qm16: the qm10/qm13 budget with the frame axis — band-join sides
    // + ONE collect_set pair agg + harness ORDER BY; the frame grid
    // never in an Exchange
    "qm16_video_tile_neardup" -> Shape(4, forbid = noCross ++ noSmj,
      require = Seq("ShuffledHashJoin", "dhash64", "grid_tile", "partial_collect_set"),
      noWideShuffle = true),
    // qm17: the qm12/qm15 budget with a Generate tail — one scan-riding
    // projection (resize + pooling, both native codegen'd since round
    // 21 — the `conv` token of the old interpreted hex pooling is gone
    // by design), one posexplode, harness sort only
    "qm17_pooled_embedding" -> Shape(1, forbid = noCross ++ noSmj,
      require = Seq("resize_rgb", "pooled_features_rgb"),
      noWideShuffle = true),
    // k-bounded aggregate tails: the partial TopKBySim phase IS the
    // "<=k rows per map task enter the shuffle" claim
    "ql4_cosine_topk" -> Shape(require = Seq("partial_topkbysim")),
    "ql27_quantized_topk" -> Shape(require = Seq("partial_topkbysim")),
    "ql65_pq_topk" -> Shape(require = Seq("partial_topkbysim", "pq_adc_cosine"),
      noWideShuffle = true),
    // ql66: the composed FAISS layout — IVF assignment prunes the scan
    // side, ADC scores codes, bounded top-k tail; neither embeddings nor
    // codes ride any Exchange
    "ql66_ivfpq_topk" -> Shape(require =
      Seq("partial_topkbysim", "pq_adc_cosine", "nearest_centroids"),
      noWideShuffle = true),
    // ql67: postings + df-branch + scalar-stats corpus scans plus three
    // pushed-down query-side scans (doc_id < 8) = 6 static; every join
    // broadcasts, the rank window prunes map-side, contributions are the
    // fused generator's rows — never a sort-merge or cartesian join
    "ql67_bm25_topk" -> Shape(maxScans = 6, forbid = noSmj ++ noCross,
      require = Seq("WindowGroupLimit", "BroadcastHashJoin", "explodetermcounts")),
    // ql67b: the SERVING plan — postings/stats read from the persisted
    // index (narrow parquet, NO term-count generator anywhere: the text
    // was tokenized at build time, which is the whole point), query-side
    // doc scans pushed down, every join broadcasts, rank window prunes
    // map-side. The generator's absence is the machine proof that
    // serving never re-tokenizes the corpus.
    "ql67b_bm25_serve" -> Shape(maxScans = 7, forbid =
      noSmj ++ noCross ++ Seq("explodetermcounts"),
      require = Seq("WindowGroupLimit", "BroadcastHashJoin")),
    // ql68: four broadcast probes, one (doc) agg, bounded top-n tail;
    // 13 static scans are the lmEstimate branches AQE dedupes (ql54)
    "ql68_dsir_select" -> Shape(maxScans = 13, forbid = noSmj ++ noCross,
      require = Seq("TakeOrderedAndProject", "partial_sum")),
    // ql69: one scan, the rank window's Exchange, map-side group prune
    "ql69_weighted_sample" -> Shape(maxScans = 1, forbid = noSmj ++ noCross,
      require = Seq("WindowGroupLimit", "xxhash64")),
    // ql70: two generator scan families — bigram (count agg + total) and
    // unigram (the count table referenced by BOTH unigram joins + the
    // total) = 5 static scans; AQE dedupes the identical unigram-count
    // stages at runtime (the ql54 convention). Never a cross join,
    // bounded top-K tail
    "ql70_collocations" -> Shape(maxScans = 5, forbid = noCross,
      require = Seq("TakeOrderedAndProject")),
    // qm4: one scan, explode + substring projection, only the harness
    // ORDER BY shuffles
    "qm4_frame_sample" -> Shape(1, maxScans = 1, forbid = noCross),
    // qm5: the ragged sibling — same one-scan explode+substring budget
    "qm5_frame_sample_ragged" -> Shape(1, maxScans = 1, forbid = noCross),
    // qm6: one scan through the codec boundary, only the harness ORDER BY
    "qm6_audio_fingerprint" -> Shape(1, maxScans = 1, forbid = noCross,
      require = Seq("audiohash64")),
    // qm7: one scan, demux + slice projections, only the harness ORDER BY
    "qm7_avi_demux" -> Shape(1, maxScans = 1, forbid = noCross),
    "ql33_knn_graph" -> Shape(require = Seq("partial_topkbysim")),
    // ql29: line-hash aggs + anti join + reassembly agg — no corpus-wide
    // window anywhere
    "ql29_boilerplate" -> Shape(forbid = Seq("Window [")),
    // round-14 second batch: budgets pinned at the audited sf0.001
    // values — any plan drift (a lost pushdown, a join strategy flip, an
    // extra scan) goes red and gets adjudicated instead of shipping
    "qa1_grouped_agg" -> Shape(2, maxScans = 1, require = Seq("partial_")),
    "qa2_count_distinct" -> Shape(2, maxScans = 1, require = Seq("partial_")),
    "qa3_rollup" -> Shape(2, forbid = noSmj, require = Seq("Expand") ++ bhj),
    "qw1_rank_window" -> Shape(2, maxScans = 1,
      require = Seq("Window [", "WindowGroupLimit")),
    "qw2_running_sum" -> Shape(2, maxScans = 1, require = Seq("Window [")),
    // top-k NEVER globally sorts: limit+sort fuse into TakeOrdered with
    // ZERO Exchanges (per-partition top-k, reduced merge on the driver)
    "qs1_topk" -> Shape(0, require = Seq("TakeOrderedAndProject")),
    "qt1_tumbling" -> Shape(2, maxScans = 1, require = Seq("partial_")),
    "qt3_sliding" -> Shape(2, maxScans = 1, require = Seq("Expand")),
    "ql3_top_terms" -> Shape(1, require = Seq("TakeOrderedAndProject", "Generate")),
    "ql13_ngram_terms" -> Shape(1, require = Seq("TakeOrderedAndProject", "Generate")),
    "qj2_join_3way" -> Shape(2, forbid = noSmj, require = bhj),
    "qj4_range_join" -> Shape(2, forbid = noSmj ++ noCross, require = bhj),
    "qj5_bloom_join" -> Shape(2, forbid = noSmj, require = bhj :+ "might_contain"),
    // the sample is a scan-riding predicate: one scan, only the harness
    // ORDER BY shuffles
    "ql15_hash_sample" -> Shape(1, maxScans = 1),
    "ql16_jaccard_pairs" -> Shape(8, forbid = noCross, require = bhj),
    "qx2_cube" -> Shape(2, require = Seq("Expand")),
    "qx5_grouping_sets" -> Shape(2, require = Seq("Expand")),
    // base metrics in ONE scan + one narrow scan per exact distinct
    // (4 profiled columns = 5 scans); the Expand rewrite is FORBIDDEN —
    // its reappearance would mean the distincts fused back into the
    // shared agg (the r22 111-MB-shuffle regression)
    "qx10_profile" -> Shape(12, maxScans = 5,
      forbid = Seq("Expand"), require = Seq("Generate")),
    // binary payloads shuffle exactly once (the byte-budget placement)
    "qm2_media_fingerprint" -> Shape(1),
    "ql45_gopher_repetition" -> Shape(5, maxScans = 3, forbid = noSmj,
      require = Seq("Generate") ++ bhj),
    "ql49_pack_sequences" -> Shape(2, forbid = noSmj,
      require = Seq("Window [") ++ bhj),
    // ql10's LeftOuter id-merge legitimately plans as a narrow SMJ — the
    // pinned tokens are the DECIMAL agg + broadcast weight dim instead
    "ql10_langid" -> Shape(4, require = Seq("SortAggregate", "Generate") ++ bhj),
    "qc2_concurrent" -> Shape(3, require = Seq("InMemoryTableScan")),
    "ql21_token_shards" -> Shape(2, maxScans = 1,
      require = Seq("Window [") ++ bhj),
    "ql22_mix_budget" -> Shape(4, require = Seq("Window [") ++ bhj),
    "ql25_tfidf" -> Shape(5, maxScans = 2,
      require = Seq("WindowGroupLimit", "Generate")),
    "ql1_exact_dedup" -> Shape(3, maxScans = 1, require = Seq("partial_")),
    "ql2_text_stats" -> Shape(2, maxScans = 1),
    // round-14 third batch — every audited claim except ql50 now has a
    // machine row (ql50's registry form localCheckpoints, collapsing the
    // static plan; its persist-cut claim is the dedicated executed-plan
    // test in PlanShapeSpec instead)
    "ql44b_domain_stats_psl" -> Shape(2, maxScans = 1,
      require = Seq("psl_domain", "partial_")),
    // exact form: the ONE documented per-language sort boundary
    "ql47_percentile_buckets" -> Shape(2, maxScans = 1, require = Seq("Window [")),
    // approx form: two scan passes (cuts agg + probe), cuts broadcast
    // back, NO per-language sort anywhere
    "ql47b_percentile_buckets_approx" -> Shape(2, maxScans = 2,
      forbid = Seq("Window ["),
      require = Seq("approx_percentile") ++ bhj),
    // static budget only — the one-scan stage-dedup claim is the
    // executed-plan test (AQE reuse is invisible statically)
    "ql54_lm_estimate" -> Shape(8, maxScans = 4, forbid = noCross,
      require = Seq("Generate")),
    "ql5_token_set_dups" -> Shape(3, maxScans = 2, forbid = noCross,
      require = Seq("ShuffledHashJoin")),
    "ql60_nb_train" -> Shape(8, maxScans = 5, forbid = noSmj,
      require = Seq("Generate") ++ bhj),
    "qt2_session" -> Shape(2, maxScans = 1, require = Seq("MergingSessions")),
    "qt5_first_seen" -> Shape(2, maxScans = 1, forbid = Seq("Window ["),
      require = Seq("SortAggregate", "partial_min")),
    "qu1_intersect" -> Shape(2, maxScans = 2, forbid = noSmj, require = bhj),
    "qu1_except" -> Shape(2, maxScans = 2, forbid = noSmj, require = bhj),
    // post-checkpoint tail of the iterative build: the final stage must
    // still never cross-join
    "ql34_knn_descent" -> Shape(1, forbid = noCross),
    // ql50b has NO static row: the registry form localCheckpoints
    // (materialize-then-release, the r14 ADVICE gate-cache-leak fix), so
    // its plan collapses to an ExistingRDD scan exactly like ql50's — the
    // lazy chain's shape (never a cross join, the one per-language bucket
    // window) is gated directly in PlanShapeSpec on the un-collapsed
    // chain, the ql50 convention
  )

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("# Physical-plan audit")
    println()
    // ASCII only: the console encoding in batch runs mangles non-ASCII
    println(s"Generated by `sbt -error \"runMain graft.tools.PlanAudit $dir\"` -- regenerate, don't hand-edit.")
    for ((q, claim) <- audited) {
      println()
      println(s"## $q")
      println()
      println(s"Expected shape: $claim")
      println()
      println("```")
      // queryExecution.explainString avoids stdout interleaving surprises;
      // one failing query must not truncate the whole artifact
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case t: Throwable => println(s"ERROR dumping $q: ${t.getMessage}")
      }
      println("```")
    }
    spark.stop()
  }
}
