package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.md5Prefix60Col

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines: every decision derives from a content-stable hash, so a
  * re-run (or a different cluster) selects exactly the same rows — no
  * RNG state, no `rand()` (which breaks retry idempotence and
  * cross-engine checks).
  *
  * 100 TB posture: pure per-row column expressions — embarrassingly
  * parallel, no shuffle, codegen'd end to end; the selection commutes
  * with partitioning.
  */
object Sampling {

  /** Uniform-in-[0,1) from a key: the first 60 bits of md5 over the
    * stringified key, divided by 2⁶⁰. Both halves are engine-portable
    * (DuckDB: `CAST('0x'||substr(md5(k),1,15) AS BIGINT) / 2^60`), so
    * oracles reproduce the draw bit-for-bit.
    */
  def hashUniformCol(key: Column): Column =
    md5Prefix60Col(key.cast("string")).cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Deterministic stratified sampling: keep a row iff its hash draw
    * falls under its stratum's rate — the "data mixing" primitive
    * (e.g. downweight crawl text, keep all curated text). Unlisted
    * strata use `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
                       rates: Seq[(String, Double)],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(r)).otherwise(acc)
    }
    df.filter(hashUniformCol(keyCol) < rate)
  }

  /** Bucket-decomposed per-group ordered scan — the shared scale
    * shape of every "rank/accumulate within group in md5(key) order"
    * operator here ([[stratifiedTake]], [[tokenBudgetSample]],
    * [[curriculumInterleave]]). A window partitioned by the group
    * alone floors parallelism at the DISTINCT-GROUP count (a corpus
    * cut per-language serializes on a handful of partitions); the
    * md5 sort key is its own range partitioner — the first hex
    * character splits every group into 16 ORDER-RESPECTING
    * sub-buckets (every key in bucket '0' sorts before any key in
    * '1'), so rank and running sum decompose into:
    *
    *  1. per-(group, bucket) row/value totals — a map-reduced frame
    *     of ≤ 16·|groups| rows whose within-group running sum over
    *     PRECEDING buckets is each bucket's offset;
    *  2. a within-(group, bucket) window at 16×|groups| parallelism,
    *     shifted by the broadcast offsets.
    *
    * `pruneOffsets` filters the offsets frame BEFORE the join —
    * buckets every caller-side filter would reject wholesale (offset
    * already past a take count or token budget) never shuffle their
    * rows at all, which is what turns a prefix-take over 100 TB into
    * a scan that moves only the kept head.
    *
    * Cost shape: the input projection is computed TWICE (the offsets
    * aggregation and the ranked side are separate subplans), so an
    * expensive group expression — q88's lang-ID regexes — pays two
    * map passes where the single window paid one (measured ~2× at
    * fixture scale: q88 0.31 → 0.62 s, q129 0.16 → 0.35 s). That is
    * the intended trade: two embarrassingly-parallel pruned passes
    * instead of one pass serialized at |groups| tasks — at 1000
    * executors the window floor loses by orders of magnitude, and
    * materializing a corpus-cardinality projection to save the second
    * pass would pin corpus-sized blocks (the wrong memory bet at
    * 100 TB).
    *
    * Contract: `_grp` and `_key` columns must exist; adds `_rn`
    * (1-based per-group rank in (md5(_key), _key) order) and, when
    * `valueCol` is set, `_cum` (inclusive per-group running sum) —
    * bit-identical to the single-window forms, which is what the
    * DuckDB oracles replay. The offsets join is broadcast: group
    * cardinality is recipe-sized by construction (strata, sources,
    * languages — budgets are authored per group); drop the hint if a
    * caller ever groups on an unbounded key.
    */
  private def bucketedOrderScan(df: DataFrame, valueCol: Option[Column],
                                pruneOffsets: DataFrame => DataFrame = identity)
      : DataFrame = {
    val internal = Seq("_mk", "_b", "_og", "_ob", "_off_n", "_off_v", "_rn", "_cum")
    val clash = df.columns.toSeq.intersect(internal)
    require(clash.isEmpty, "bucketedOrderScan reserves columns " +
      s"${internal.mkString(", ")}; input already has ${clash.mkString(", ")}")
    // a NULL key hashes to a NULL md5 → NULL bucket, and a NULL group
    // is a legitimate window partition in the single-window forms this
    // decomposes — so the bucket/group join below must be NULL-SAFE
    // (an equi-join would silently drop those rows)
    val base = df
      .withColumn("_mk", md5(col("_key").cast("string")))
      .withColumn("_b", substring(col("_mk"), 1, 1))
    val aggs = count(lit(1)).as("_bn") +:
      valueCol.map(v => sum(v.cast("long")).as("_bv")).toSeq
    val wOff = Window.partitionBy("_grp").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = base.groupBy(col("_grp"), col("_b"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_off_n", coalesce(sum("_bn").over(wOff), lit(0L)))
    val offsets = valueCol.fold(offsets0)(_ => offsets0
      .withColumn("_off_v", coalesce(sum("_bv").over(wOff), lit(0L))))
    val kept = pruneOffsets(offsets)
      .select(col("_grp").as("_og") +: col("_b").as("_ob") +: col("_off_n") +:
        valueCol.map(_ => col("_off_v")).toSeq: _*)
    val wIn = Window.partitionBy("_grp", "_b").orderBy(col("_mk"), col("_key"))
    val ranked = base.join(broadcast(kept),
        col("_grp") <=> col("_og") && col("_b") <=> col("_ob"))
      .withColumn("_rn", col("_off_n") + row_number().over(wIn))
    valueCol.fold(ranked)(v => ranked.withColumn("_cum",
        col("_off_v") + sum(v.cast("long")).over(
          wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .drop("_mk", "_b", "_og", "_ob", "_off_n", "_off_v")
  }

  /** Exact-count stratified take — "mix to a target budget": keep
    * deterministically the first `counts(stratum)` rows per stratum in
    * md5-hash order (the rank form of the same uniform draw as
    * [[stratifiedSample]], so the kept set is stable across re-runs
    * and engines). Unlisted strata keep `defaultCount`.
    *
    * Scale shape: [[bucketedOrderScan]] — 16×|strata| window
    * parallelism instead of one task per stratum, and buckets whose
    * rank offset is already past the stratum's count are pruned
    * before their rows shuffle (the untaken tail of a 100 TB corpus
    * never moves).
    */
  def stratifiedTake(df: DataFrame, stratumCol: Column, keyCol: Column,
                     counts: Seq[(String, Long)],
                     defaultCount: Long = 0L): DataFrame = {
    def cntOf(c: Column) = counts.foldLeft(lit(defaultCount)) {
      case (acc, (k, n)) => when(c === k, lit(n)).otherwise(acc)
    }
    val reserved = Seq("_grp", "_key", "_rn")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"stratifiedTake reserves columns ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")}")
    bucketedOrderScan(
        df.withColumn("_grp", stratumCol).withColumn("_key", keyCol),
        valueCol = None,
        pruneOffsets = _.filter(col("_off_n") < cntOf(col("_grp"))))
      .filter(col("_rn") <= cntOf(col("_grp")))
      .drop("_grp", "_key", "_rn")
  }

  /** Temperature-scaled source mixing (the multilingual α-sampling of
    * mBERT/XLM-R, α = 0.5 ⇒ T = 2): sampling weight w_s ∝ √n_s, so
    * small sources are upweighted relative to their share; the keep
    * rate for stratum s under a total budget B is
    * min(1, B·w_s / (Σw · n_s)), applied with the same deterministic
    * [[hashUniformCol]] draw as every sampler here.
    *
    * Determinism: √ is IEEE-correctly-rounded in every engine (why
    * α = 0.5 and not a pow() temperature — pow's last bit is libm-
    * dependent), and the weights collapse to FIXED POINT
    * (floor(√n·2³⁰) as BIGINT) before the cross-stratum sum, so Σw is
    * exact in any order; the rate is then one double division chain
    * from exact integers.
    *
    * Scale shape: one stratum-keyed count aggregation (tiny result),
    * rates broadcast back, per-row hash filter — the corpus is
    * scanned twice and never shuffled.
    */
  def temperatureMix(df: DataFrame, stratumCol: String, keyCol: String,
                     budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_fp",
        floor(sqrt(col("n_docs").cast("double")) * lit(1073741824.0)).cast("long"))
    val tot = counts.agg(sum("w_fp").as("sum_w"))
    // stratum-count-sized (a handful of rows) but derived from a full
    // corpus scan — materialized so its two consumers (the keep filter
    // and the output join) don't each re-pay that scan
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0),
        (col("w_fp") * lit(budget)).cast("double")
          / (col("sum_w").cast("double") * col("n_docs"))))
      .localCheckpoint()
    val kept = df
      .join(broadcast(rates.select(col("stratum").as(stratumCol), col("rate"))),
        stratumCol)
      .filter(hashUniformCol(col(keyCol)) < col("rate"))
      .groupBy(col(stratumCol).as("stratum")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("stratum"), "left")
      .select(col("stratum"), col("n_docs"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Sequence packing — assign docs to fixed token-budget bins (the
    * batch-assembly step before pretraining: concatenate docs until
    * the context window fills). Greedy fill in deterministic md5-hash
    * order; a doc that straddles the budget stays in the bin where it
    * started (overflow-tolerant packing). Adds `shard` (md5-derived,
    * `shards`-way) and `bin` (per-shard running token count DIV
    * budget).
    *
    * Scale shape: packing is inherently sequential, so it runs PER
    * SHARD — the window keys on the shard and parallelism scales with
    * `shards` (pick shards ≈ cluster cores; bins are only comparable
    * within a shard, which is exactly how pipelines pack in practice:
    * per output file). One window shuffle keyed on shard.
    */
  def packBins(df: DataFrame, keyCol: Column, tokenCol: Column,
               budget: Long, shards: Int = 8): DataFrame = {
    require(budget > 0 && shards > 0,
      s"budget and shards must be positive, got budget=$budget shards=$shards")
    // the window partitions by the COMPUTED shard column — a same-named
    // input column would silently capture the partitioning (and the
    // output/temp names would be overwritten), so refuse the collision
    val reserved = Seq("shard", "bin", "_cum", "_start")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"packBins writes columns ${reserved.mkString(", ")}; input already has ${clash.mkString(", ")}")
    val shard = pmod(md5Prefix60Col(keyCol.cast("string")), lit(shards.toLong))
    val w = Window.partitionBy("shard")
      .orderBy(md5(keyCol.cast("string")), keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("_cum", sum(tokenCol.cast("long")).over(w))
      // the bin where the doc STARTS: tokens before it DIV budget
      // (integer division — exact at any cumulative size)
      .withColumn("_start", col("_cum") - tokenCol.cast("long"))
      .withColumn("bin", expr(s"_start div ${budget}L"))
      .drop("_cum", "_start")
  }

  /** Fixed-length chunk spans with overlap — the RAG/packing ingest
    * primitive: each document yields token-space spans `[tok_start,
    * tok_end)` of `seqLen` tokens advancing by `seqLen − overlap`,
    * with the final span clipped to the document tail (a document
    * shorter than `seqLen` yields exactly one span; a TOKEN-LESS
    * document yields no spans at all — there is no token space to
    * span, and the `n_tok > 0` filter drops it). Pure per-row
    * integer arithmetic + one generator — embarrassingly parallel, no
    * shuffle, and any engine replays the spans exactly.
    */
  def chunkSpans(df: DataFrame, idCol: Column, textCol: Column,
                 seqLen: Int, overlap: Int): DataFrame = {
    require(seqLen > 0 && overlap >= 0 && overlap < seqLen,
      s"need seqLen > 0 and 0 <= overlap < seqLen, got seqLen=$seqLen overlap=$overlap")
    val stride = seqLen - overlap
    val n = TextAnalysis.tokenCountCol(textCol).cast("long")
    // chunks past the first: ceil((n - seqLen) / stride), integer form
    val extra = greatest(
      expr(s"(cast(n_tok as long) - ${seqLen}L + ${stride}L - 1L) div ${stride}L"),
      lit(0L))
    df.select(idCol.as("id"), n.as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L), extra)))
      .select(col("id"), col("n_tok"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + seqLen, col("n_tok")).as("tok_end"))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start"))
  }

  /** Token-budget subsample: per group, walk documents in
    * deterministic md5(id) order accumulating whitespace-token
    * counts, and keep the prefix whose cumulative total stays within
    * `budget` — the "take N tokens per source/language" cut every
    * mixture recipe specifies in tokens, not documents.
    *
    * Scale shape: [[bucketedOrderScan]] with the token running sum as
    * the value — 16×|groups| window parallelism, and buckets whose
    * offset already exceeds the budget are pruned before their rows
    * shuffle (the corpus tail never moves). Same integer sums, same
    * rows — any single-window engine (the oracle) reproduces the
    * output bit-for-bit.
    */
  /** Deterministic round-robin source interleave — the data-ORDER
    * companion to the mixing samplers: rank docs within each source
    * by the usual md5 draw, then emit in (round, source) order, so
    * consecutive training batches cycle through sources instead of
    * draining one file at a time (the "shuffle across sources"
    * guarantee pipelines need when shards are written source-major).
    * Sources of unequal size simply drop out of later rounds.
    *
    * Scale shape: [[bucketedOrderScan]] for the round number (the
    * per-source rank no longer serializes on |sources| tasks), then a
    * range-partitioned sort on (round, source) — standard exchanges;
    * no driver-side state. The emitted ORDER is the operator's
    * contract (the driver's gate checks row order exactly).
    */
  def curriculumInterleave(df: DataFrame, idCol: Column,
                           sourceCol: Column): DataFrame =
    bucketedOrderScan(
        df.select(sourceCol.as("_grp"), idCol.cast("long").as("_key")),
        valueCol = None)
      .select(col("_grp").as("source"), col("_key").as("id"),
        col("_rn").as("round"))
      .orderBy("round", "source", "id")

  def tokenBudgetSample(df: DataFrame, idCol: Column, textCol: Column,
                        groupCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // buckets whose token OFFSET already exceeds the budget cannot
    // contribute a row with cum ≤ budget (values are nonnegative) —
    // pruned before their rows ever shuffle
    bucketedOrderScan(
        df.select(groupCol.as("_grp"), idCol.cast("long").as("_key"),
          TextAnalysis.tokenCountCol(textCol).cast("long").as("n_tokens")),
        valueCol = Some(col("n_tokens")),
        pruneOffsets = _.filter(col("_off_v") <= budget))
      .filter(col("_cum") <= budget)
      .select(col("_grp").as("grp"), col("_key").as("id"),
        col("n_tokens"), col("_cum").as("cum_tokens"))
  }

  /** Target-mixture domain reweighting — the "data recipe" operator:
    * given an explicit target share per domain (basis points, summing
    * to ≤ 10000; unlisted domains get the remainder spread by their
    * actual mass), emit each domain's sampling weight
    * `w = target_share / actual_share` in floor-2²⁰ fixed point, plus
    * the token budget that weight implies. Mixture recipes (e.g.
    * upsample curated text 3×, downsample crawl to 40%) are stated
    * exactly this way, and the fixed-point arithmetic makes the
    * recipe reproducible by any engine — no float shares.
    *
    * `w_fp = floor(target_bp · N_total · 2²⁰ / (10000 · n_domain))`,
    * `budget_tokens = floor(n_tokens · w_fp / 2²⁰)`.
    *
    * Scale shape: one domain-keyed aggregation (map-side partials to
    * ≤|domains| rows) + a broadcast of the total — the corpus itself
    * is scanned once and never reshuffled.
    */
  def targetMixture(df: DataFrame, domainCol: Column, tokenCol: Column,
                    targetsBp: Seq[(String, Long)]): DataFrame = {
    require(targetsBp.map(_._2).forall(_ > 0) && targetsBp.map(_._2).sum <= 10000L,
      s"target basis points must be positive and sum to <= 10000, got $targetsBp")
    val perDomain = df
      .select(domainCol.as("domain"), tokenCol.cast("long").as("nt"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val total = perDomain.agg(sum("n_docs").as("n_total"))
    val bp = targetsBp.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col("domain") === k, lit(v)).otherwise(acc)
    }
    perDomain.crossJoin(broadcast(total))
      .withColumn("target_bp", bp)
      // unlisted domains: keep their natural share (weight 1.0)
      .withColumn("w_fp",
        when(col("target_bp").isNotNull,
          expr("(target_bp * n_total * 1048576L) div (10000L * n_docs)"))
          .otherwise(lit(1048576L)))
      .withColumn("budget_tokens", expr("(n_tokens * w_fp) div 1048576L"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        coalesce(col("target_bp"), lit(-1L)).as("target_bp"),
        col("w_fp"), col("budget_tokens"))
  }

  /** Power-of-two batch-shape histogram — docs bucketed by the
    * smallest 2^b ≥ token count (the shapes a padded-batch trainer
    * actually allocates), reporting per bucket the docs, real tokens,
    * and the padding that shape costs. The report that decides
    * between padded batching and the concat-chunk discipline
    * ([[concatChunkStats]]), and sizes dynamic-shape compilation
    * caches. Bucket index stays in integer arithmetic
    * (`length(bin(n−1))` — no log2 float), so any engine replays it.
    * Scale shape: per-row bucket expression + one ≤64-key
    * aggregation.
    */
  def powerOfTwoBatchShapes(df: DataFrame, tokenCol: Column): DataFrame =
    df.select(tokenCol.cast("long").as("n"))
      .withColumn("bucket",
        when(col("n") <= 1, lit(0))
          .otherwise(length(bin(col("n") - 1))).cast("int"))
      .withColumn("pad_to", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("tokens"),
        sum(col("pad_to") - col("n")).as("padding"))

  /** Deterministic upsampling materializer — turns fixed-point
    * sampling weights (the [[targetMixture]] output) into actual row
    * multiplicity: every doc emits `floor(w)` copies plus one more
    * iff its md5 draw falls under `frac(w)` (in the same 2²⁰
    * fixed point), so the EXPECTED emitted mass matches the recipe
    * exactly while every copy decision is reproducible — no RNG, and
    * upsampling w<1 degenerates to the usual keep/drop filter.
    * Emitted rows carry a `copy` index so downstream shuffles
    * de-correlate the duplicates (e.g. salt the training-order hash
    * with it).
    *
    * Scale shape: per-row `explode(sequence(...))` — output size is
    * the recipe's, input never shuffles.
    */
  def materializeWeights(df: DataFrame, keyCol: Column,
                         weightFpCol: Column): DataFrame = {
    val draw = pmod(
      md5Prefix60Col(concat(keyCol.cast("string"), lit(":up"))),
      lit(1048576L))
    df.withColumn("_wfp", weightFpCol.cast("long"))
      // integer div/mod only — Column./ is double division and would
      // round the whole-copy count at large fixed-point weights
      .withColumn("_n_copies",
        expr("_wfp div 1048576L") +
          when(draw < expr("_wfp % 1048576L"), 1L).otherwise(0L))
      .filter(col("_n_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("_n_copies") - 1)))
      .drop("_wfp", "_n_copies")
  }

  /** Concat-and-chunk accounting — the GPT-style pretraining sequence
    * construction: docs are hash-routed to shards, concatenated in
    * deterministic md5 order with one EOD token appended to each, and
    * the shard's token stream is cut into fixed `seqLen` training
    * sequences. Reports, per shard, what that construction costs:
    * how many sequences come out, how many docs straddle a sequence
    * boundary (their content gets split across two training examples
    * — the cross-doc-attention / truncation signal), and the tail
    * padding wasted in the shard's last sequence.
    *
    * Where [[packBins]] assigns each doc to the bin where it STARTS
    * (document-atomic packing, padding between docs), this operator
    * models the concatenate-then-split discipline (no padding except
    * the shard tail, docs split at boundaries) — the two standard
    * disciplines, as one assignment operator and one accounting
    * operator.
    *
    * Scale shape: one window shuffle keyed on the shard (pick shards ≈
    * cluster cores), then a ≤`shards`-row aggregate. The boundary test
    * stays in integer arithmetic — `start div L` vs `(end-1) div L`
    * over cumulative sums — so any engine replays it exactly.
    */
  def concatChunkStats(df: DataFrame, keyCol: Column, tokenCol: Column,
                       seqLen: Long, shards: Int = 8): DataFrame = {
    require(seqLen > 0 && shards > 0,
      s"seqLen and shards must be positive, got seqLen=$seqLen shards=$shards")
    val k = col("_k")
    val shard = pmod(md5Prefix60Col(k.cast("string")), lit(shards.toLong))
    val w = Window.partitionBy("shard")
      .orderBy(md5(k.cast("string")), k)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCol.as("_k"), tokenCol.cast("long").as("_n"))
      .withColumn("shard", shard)
      // +1: every doc contributes its tokens plus one EOD separator
      .withColumn("_cum", sum(col("_n") + lit(1L)).over(w))
      .withColumn("_start", col("_cum") - col("_n") - lit(1L))
      // content straddles iff its first and last CONTENT token land in
      // different sequences (EOD excluded; empty docs never straddle)
      .withColumn("_straddle",
        col("_n") > 0 &&
          expr(s"_start div ${seqLen}L") =!=
          expr(s"(_cum - 2) div ${seqLen}L"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        max("_cum").as("total_tokens"),
        sum(when(col("_straddle"), 1L).otherwise(0L)).as("n_straddle"))
      .withColumn("n_seqs",
        expr(s"(total_tokens + ${seqLen - 1}L) div ${seqLen}L"))
      .withColumn("tail_pad",
        col("n_seqs") * lit(seqLen) - col("total_tokens"))
      .select("shard", "n_docs", "total_tokens", "n_seqs", "n_straddle",
        "tail_pad")
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * (IPL 2006, "Weighted random sampling with a reservoir"): each row
    * draws u ∈ (0,1) and ranks by u^(1/w); the top-k of that key are
    * exactly a weight-proportional sample without replacement. The
    * deterministic twin of the one-pass reservoir: u comes from the
    * content-stable md5 draw ([[hashUniformCol]]), so a re-run, a
    * different cluster, or an oracle selects the SAME rows — and the
    * selection is equivalently computed as ln(u)/w descending (ln is
    * monotone; u < 1 makes both sides negative), floored to 2²⁰ fixed
    * point so the compare column is one transcendental + one IEEE
    * division away from exact integers (the q98 fixed-point-ln
    * precedent).
    *
    * This is the "keep the best k by importance" primitive between
    * [[stratifiedSample]] (keep-rate thinning, no exact count) and
    * [[stratifiedTake]] (exact count, uniform within stratum):
    * exact k AND weight-proportional inclusion — e.g. sample 100k
    * docs favoring high quality scores without letting any score
    * band be certain to win.
    *
    * Scale shape: one codegen'd map pass for the key, then a global
    * top-k — Spark plans orderBy+limit as TakeOrderedAndProject
    * (per-partition heap of k, driver merge of k·P rows), so no full
    * sort and no shuffle of the corpus. Keep k driver-sized (it's a
    * sample, not a partition of the data).
    */
  def weightedTake(df: DataFrame, keyCol: Column, weightCol: Column,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // E-S keys are scale-free in w (multiplying every weight by c
    // rescales ln(u)/w by 1/c, preserving order), so no normalization
    // pass; w must be strictly positive — fail loud per row via the
    // key turning NULL (filtered) would SILENTLY drop rows, so gate
    // with a predicate instead.
    val w = weightCol.cast("double")
    // clamp the draw away from 0 (p = 2⁻⁶⁰ per row, but ln(0) = -Inf
    // would overflow the fixed-point cast); the oracle replays the
    // same greatest()
    val u = greatest(hashUniformCol(keyCol), lit(8.673617379884035e-19))
    df.withColumn("es_fp",
        when(w > 0.0,
          floor(log(u) / w * lit(1048576.0)).cast("long"))
          .otherwise(raise_error(concat(lit("weightedTake: non-positive weight for key "),
            keyCol.cast("string")))))
      .orderBy(col("es_fp").desc, keyCol)
      .limit(k)
  }
}
