package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs) — per-row work, embarrassingly parallel, no shuffle.
  *
  * Determinism: every score is derived from integer counts via a
  * single double division, so results are bit-identical across
  * engines and partitionings.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (split keeps boundary
    * empties for leading/trailing separators).
    */
  def tokensCol(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCountCol(text: Column): Column = size(tokensCol(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars — a regex proxy for byte-pair tokenizers.
    */
  def subwordCountCol(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality-scoring signals: lexical diversity (distinct/total
    * tokens), mean token length, punctuation density. Length and
    * punctuation ratios are the standard pre-train quality filters.
    */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("n_punct", length(regexp_replace(col(textCol), "[^.,;:!?]", "")))
      .withColumn("lex_diversity",
        col("n_distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        (length(col(textCol)) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / length(col(textCol)))
  }

  /** Gopher-style quality VERDICT: the per-row signals folded into a
    * failure count and a keep/drop decision — the actual filtering
    * step of a pretraining pipeline (each rule a 0/1 flag so the
    * verdict explains itself). Thresholds follow the
    * MassiveText-style ranges, adapted to the fixture's scale.
    */
  def qualityVerdict(df: DataFrame, textCol: String = "text"): DataFrame = {
    val q = withQuality(df, textCol)
    val fails = Seq(
      col("n_tokens") < 5 || col("n_tokens") > 5000,
      col("mean_token_len") < 2.0 || col("mean_token_len") > 12.0,
      col("lex_diversity") < 0.3,
      col("punct_ratio") > 0.2)
    q.withColumn("n_fail", fails.map(f => when(f, 1).otherwise(0)).reduce(_ + _))
      .withColumn("keep", (col("n_fail") === 0).cast("int"))
  }

  /** Language-ID heuristic: charset detection (CJK / Cyrillic /
    * Arabic) first, else an English-stopword ratio gate — the n-gram
    * heuristic family used by pre-train corpus filters. Deterministic
    * and cheap; a real model would ride the same column pipeline.
    */
  def langIdCol(text: Column): Column = {
    val nTok = tokenCountCol(text)
    val enStop = size(filter(tokensCol(text),
      t => t.isin("the", "a", "of", "and", "in", "to", "is")))
    when(regexp_count(text, lit("[\\u4e00-\\u9fff]")) > 0, "zh")
      .when(regexp_count(text, lit("[\\u0400-\\u04ff]")) > 0, "ru")
      .when(regexp_count(text, lit("[\\u0600-\\u06ff]")) > 0, "ar")
      .when(enStop.cast("double") / nTok >= 0.05, "en")
      .otherwise("other")
  }

  /** Rolling polynomial fingerprint of the first `prefixLen` chars:
    * fold (acc·31 + codepoint) mod 1e9+7 — the rolling-hash document
    * fingerprint, usable as a cheap near-dup blocking key.
    */
  def fingerprintCol(text: Column, prefixLen: Int = 64): Column =
    // one prefix slice, then a per-character fold — the per-position
    // substr(text, i, 1) variant re-seeks from the string head each
    // step (O(prefixLen²) per row on long strings); same fold
    // semantics and hash values (ascii of the identical char sequence)
    aggregate(
      transform(split(substring(text, 1, prefixLen), ""), c => ascii(c)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
  /** PII patterns shared by detection, redaction, and the SQL oracles.
    * Both are ASCII-classed and valid in Java regex AND RE2 (DuckDB),
    * so an oracle reproduces match-for-match — ON ASCII TEXT. The `\b`
    * anchors in Ipv4Re diverge between engines next to non-ASCII word
    * characters (Java's \b is Unicode-aware where RE2's is ASCII), so
    * the cross-engine contract assumes ASCII input; fixtures and
    * oracles must keep that property (q90's documents fixture does).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction: per-doc match counts for the standard
    * scrub targets (emails, IPv4 literals), a has_pii flag, and the
    * redacted text (emails first, then IPs — fixed order so engines
    * agree when patterns could overlap). Pure per-row regex columns —
    * codegen, no shuffle; the filtering/reporting decision composes
    * downstream like [[qualityVerdict]].
    */
  def withPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ipv4", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("has_pii",
        (col("n_emails") > 0 || col("n_ipv4") > 0).cast("int"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"))

  /** k-anonymity census over quasi-identifier columns — the
    * re-identification audit a training-data governance pass runs
    * next to the [[withPii]] scrub: rows sharing every quasi value
    * form an equivalence class; classes smaller than `k` are
    * re-identifiable (Sweeney, IJUFKS 2002). Returns one row per
    * class — the quasi values, the class size, and an at_risk flag —
    * the table a suppression/generalization step consumes (suppress
    * at-risk rows, or coarsen a quasi column and re-census).
    *
    * Scale shape: ONE hash aggregation on the quasi tuple (map-side
    * partials — the census never shuffles rows, only per-class
    * partial counts); output cardinality is the class count, which
    * the caller controls by generalizing the quasi columns (bucket
    * continuous values BEFORE the census, never pass raw ones).
    */
  def kAnonymityCensus(df: DataFrame, quasiCols: Seq[(String, Column)],
                       k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=1 flags nothing), got $k")
    df.groupBy(quasiCols.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", (col("n") < k).cast("int"))
  }

  /** Unigram language-model quality score (the CCNet/KenLM-style
    * perplexity filter, reduced to its relational core): fit a
    * unigram model on the corpus itself (add-one-smoothed token
    * frequencies), then score every doc by its mean token
    * log-probability — low scores flag out-of-distribution/garbage
    * text exactly the way the reference pipelines use LM perplexity.
    *
    * Shape: token rows → one global token-count aggregation (the
    * model — vocabulary-sized, broadcast back), equi-join tokens to
    * their probabilities, one per-doc aggregation. Two shuffles, both
    * keyed on data-sized keys; the model never leaves the cluster.
    *
    * Determinism: ln is evaluated once per DISTINCT token (the model
    * side), immediately quantized to fixed point
    * (floor(ln(p)·2²⁰) as BIGINT); per-doc sums then add integers, so
    * aggregation order cannot perturb anything, and the reported mean
    * is one division. An engine pair whose ln differs in the last ulp
    * could in principle floor a model value differently; with a
    * vocabulary of distinct tokens the boundary probability is ~2⁻³²
    * per token and the oracle gate would catch it loudly.
    */
  /** Vocabulary coverage / OOV audit: fix the vocabulary to the
    * `vocabSize` most frequent corpus tokens (count desc, token asc —
    * a total order, so the boundary is deterministic), then report
    * per document how many token OCCURRENCES fall outside it — the
    * measurement that sizes a tokenizer's vocab against a corpus.
    *
    * Scale shape: token counts shuffle once on the token key
    * (map-side partials), the vocab is top-K of that aggregate
    * (vocab-sized, broadcast), and the per-doc pass is a broadcast
    * left-join + doc-keyed aggregation — the corpus is never
    * shuffled on anything wider than the doc id.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocabSize: Int): DataFrame = {
    // kernel-counted rows: corpus token mass by Σ tf, per-doc
    // occurrence counts as tf-weighted sums (see unigramLogProb)
    val tok = Dedup.gramCountRows(df, idCol, textCol, n = 1)
    val vocab = tok.groupBy("s").agg(sum("tf").as("c"))
      .orderBy(col("c").desc, col("s")).limit(vocabSize)
      .select(col("s"), lit(1).as("in_v"))
    tok.join(broadcast(vocab), Seq("s"), "left")
      .groupBy("id")
      .agg(sum("tf").as("n_tok"),
        sum(col("tf") * coalesce(col("in_v"), lit(0))).as("n_in_vocab"))
      .select(col("id"), col("n_tok"), col("n_in_vocab"),
        ((col("n_tok") - col("n_in_vocab")).cast("double") / col("n_tok"))
          .as("oov_rate"))
  }

  /** Training-sequence windowing: split each document's token stream
    * into `window`-token chunks at `stride` (< window ⇒ overlap) —
    * the document → training-example step of a pretraining pipeline.
    * Emits (id, chunk_id, n_tokens, chunk_md5) with the md5 taken
    * over the space-joined chunk so an oracle can certify every
    * chunk's CONTENT, not just its shape. Short documents yield one
    * (possibly short) chunk; the tail chunk is whatever remains.
    *
    * Scale shape: one scan, tokens stay as a per-row ARRAY (no
    * explode to token rows); chunk starts generate per doc and
    * `slice` projects each window — per-row codegen, no shuffle, no
    * window function.
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive: $window/$stride")
    val nChunks = when(size(col("ts")) <= window, lit(0))
      .otherwise(ceil((size(col("ts")) - lit(window)).cast("double") / stride).cast("int"))
    df.select(col(idCol).as("id"), tokensCol(col(textCol)).as("ts"))
      .select(col("id"), col("ts"),
        explode(sequence(lit(0), nChunks)).as("chunk_id"))
      .select(col("id"), col("chunk_id"),
        slice(col("ts"), col("chunk_id") * stride + 1, lit(window)).as("w"))
      .select(col("id"), col("chunk_id"),
        size(col("w")).as("n_tokens"),
        md5(concat_ws(" ", col("w"))).as("chunk_md5"))
  }

  /** Gopher/MassiveText duplicated-n-gram mass per document: of a
    * document's full word n-grams, the fraction of OCCURRENCES that
    * belong to a gram repeated within the same document, and the
    * char-weighted variant (occurrence count × gram length — the
    * occurrence-weighted reading of Gopher's "fraction of characters
    * in duplicate n-grams"; the fixture corpus has no line structure,
    * so the line-based siblings don't discriminate here). Documents
    * shorter than n tokens carry zero grams and report 0.0.
    *
    * Scale shape: gram rows aggregate per (doc, gram) then per doc —
    * two hash aggregations on doc-prefixed keys, work linear in
    * corpus tokens; the final left join only restores gram-less short
    * docs and joins on the doc id. All fractions are exact integer
    * ratios through one IEEE division — engine-portable.
    */
  def dupGramStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    // map-only (round 11): the per-doc gram frequency vector comes
    // from one gram_counts kernel call; the four masses are array
    // folds over its full-gram entries (short docs' partial shingle
    // filters out, token-less docs fold over null), so both hash
    // aggregations AND the short-doc-restoring left join of the row
    // form disappear — every doc keeps a row by construction.
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(col("id"))
      .select(col("id"),
        call_function("gram_counts", col("text"), lit(n)).as("h"))
      .select(col("id"),
        // full-gram gate WITHOUT a per-element split: a partial
        // shingle exists iff the doc has < n tokens, and such docs
        // emit exactly ONE gram — so only 1-entry tables can be
        // partial, and one split on that single entry decides it
        when(size(col("h")) > 1 ||
            size(split(element_at(col("h"), 1)("s"), " ")) === n, col("h"))
          .otherwise(slice(col("h"), 1, 0)).as("g"))
      .select(col("id"),
        // ONE traversal accumulating all four masses (token-less
        // docs fold over null → null struct → coalesce to zeros)
        aggregate(col("g"),
          struct(lit(0L).as("n"), lit(0L).as("d"),
            lit(0L).as("m"), lit(0L).as("dm")),
          (a, e) => struct(
            (a("n") + e("tf")).as("n"),
            (a("d") + when(e("tf") >= 2, e("tf")).otherwise(0L)).as("d"),
            (a("m") + e("tf") * length(e("s"))).as("m"),
            (a("dm") + when(e("tf") >= 2, e("tf") * length(e("s")))
              .otherwise(0L)).as("dm"))).as("acc"))
      .select(col("id"),
        coalesce(col("acc")("n"), lit(0L)).as("n_grams"),
        coalesce(col("acc")("d"), lit(0L)).as("dup_occ"),
        coalesce(col("acc")("m"), lit(0L)).as("mass"),
        coalesce(col("acc")("dm"), lit(0L)).as("dup_mass"))
      .select(col("id"),
        col("n_grams"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("dup_occ").cast("double") / col("n_grams"))
          .as("dup_gram_frac"),
        when(col("mass") === 0, lit(0.0))
          .otherwise(col("dup_mass").cast("double") / col("mass"))
          .as("dup_char_frac"))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus unigram LM ([[unigramLogProb]]), then assign head/middle/
    * tail buckets by `ntile(nBuckets)` WITHIN each `groupCol` value
    * (CCNet buckets per language) ordered by score descending with
    * the doc id as a total-order tie-break.
    *
    * Scale shape: the window is PARTITIONED by the group column, so
    * the rank sort distributes across groups (per-group skew bounds
    * the longest task — at web-corpus scale each language shard is
    * further split by snapshot/source before bucketing, or bucket
    * thresholds come from a quantile sketch and assignment becomes a
    * per-row CASE; this exact-rank form is the certifiable gate for
    * that pipeline). Ordering doubles cross-engine is safe here: the
    * score is an exact fixed-point integer sum divided in the same
    * association on both sides, so ties and order agree bit-for-bit.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(df, idCol, textCol)
    val meta = df.select(col(idCol).as("id"), col(groupCol).as("grp"))
    scored.join(meta, "id")
      .select(col("id"), col("grp"), col("n_tokens"), col("mean_logp"),
        ntile(nBuckets).over(
          Window.partitionBy("grp").orderBy(col("mean_logp").desc, col("id")))
          .as("ppl_bucket"))
  }

  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // kernel-counted (id, token, tf) rows feed both the model fit and
    // the per-doc scoring join — the plan re-runs the kernel per
    // branch. Deliberately NOT cached: materializing token rows
    // measured no better than recomputing them from the compressed
    // scan (within noise, same host, sf0.1) while pinning executor
    // memory. Per-occurrence sums replay exactly as tf-weighted sums
    // (integers), and the broadcast model join preserves the doc
    // partitioning so the scoring aggregation is exchange-free.
    val toks = Dedup.gramCountRows(df, idCol, textCol, n = 1)
    val counts = toks.groupBy("s").agg(sum("tf").as("c"))
    val totals = counts.agg(sum("c").as("tot"), count(lit(1)).as("vocab"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("s"),
        floor(log((col("c") + lit(1.0)) / (col("tot") + col("vocab")))
          * lit(1048576.0)).cast("long").as("lp_fp"))
    toks.join(broadcast(model), "s")
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("lp_fp")).as("sum_fp"))
      .select(col("id"), col("n_tokens"),
        (col("sum_fp").cast("double") / lit(1048576.0) / col("n_tokens"))
          .as("mean_logp"))
  }

  /** Repetition quality signals (the Gopher/MassiveText-style
    * pretraining filters, adapted to token level — the fixture corpus
    * carries no line structure): distinct-token ratio, and the
    * fraction of all unigrams/bigrams taken by the single most
    * frequent one. Highly repetitive machine-generated text scores
    * near 1.0 on the top-fraction columns and near 0 on distinctness.
    *
    * Relational shape: tokens/bigrams explode to rows (reusing the
    * shingle machinery), two hash aggregations per n — per-(doc, gram)
    * counts, then per-doc totals — and one broadcast-sized join; work
    * is linear in corpus tokens, shuffles key on (doc, gram).
    * (A fused single-pass variant — one explode, grams tagged u/b and
    * counted in one aggregation — was measured SLOWER at sf0.1
    * (1.6 s vs 1.3 s): the tag doubles the row count through a wider
    * aggregation key, costing more than the saved second scan. Total
    * shuffled gram rows are the same either way.)
    */
  /** Hashed-n-gram linear classifier score (the fastText-style
    * quality/domain classifier every curation pipeline applies at
    * corpus scale — CCNet's lang filter, GPT-3/LLaMA's Wikipedia-vs-
    * CommonCrawl quality model): word unigrams + bigrams hash into
    * `buckets` weight slots, a doc's score is the mean slot weight
    * over its gram occurrences, `keep` thresholds at 0.
    *
    * The model is DATA, not code: a `buckets`-row weight table
    * broadcast to the gram rows — exactly how a trained coefficient
    * vector ships to 1000 executors (swap the generated table for a
    * real model's weights and nothing else changes). Here the weights
    * are a deterministic hash of the slot id (this engine has no
    * trainer), which exercises the identical plan: explode grams →
    * bucket key → broadcast equi-join → one doc-keyed aggregation.
    * The corpus shuffles once, on the doc id, with integer partial
    * sums; the model never exceeds model size on the wire.
    *
    * Determinism: weights are integer fixed-point (2^-20 steps in
    * [-1, 1]), so the per-doc sum is an integer aggregation immune to
    * order, and the reported mean is one final division.
    */
  def hashedNgramScore(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    // ONE hashed_ngram_score kernel call per document (round 11):
    // scoring a doc is row-local — hash each unigram/bigram into its
    // weight slot and sum — so the gram explode, the broadcast weight
    // join, and the doc-keyed aggregation all collapse into a
    // map-only corpus scan (the correct 100 TB shape: no exchange
    // the algorithm doesn't need). Gram multiset, slot hash, and
    // weight table are bit-identical to the row form the DuckDB
    // oracle replays. repartition(id) only spreads single-file local
    // inputs and pre-aligns q159's label join.
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      // token-less docs (the kernel's null case) drop HERE, as a cheap
      // scan-pushed predicate: rlike(\S) ⟺ "has a non-\s char" ⟺
      // ntok > 0 (the kernel tokenizes on exactly Java-regex \s). A
      // post-kernel isNotNull filter instead gets pushed below the
      // repartition and re-inlines the kernel — every doc would pay
      // it twice (once in the filter, once in the projection).
      .filter(col("text").rlike("\\S"))
      .repartition(col("id"))
      .select(col("id"),
        call_function("hashed_ngram_score", col("text"), lit(buckets)).as("hs"))
      .select(col("id"), col("hs.n_grams").as("n_grams"),
        col("hs.sum_fp").as("sum_fp"))
      .select(col("id"), col("n_grams"), col("sum_fp"),
        (col("sum_fp").cast("double") / 1048576.0 / col("n_grams"))
          .as("mean_w"),
        when(col("sum_fp") >= 0, 1).otherwise(0).as("keep"))
  }

  /** Curation survival funnel — the yield report a pipeline owner
    * reads before anything else: per source, documents surviving
    * each successive admission gate (Gopher-style quality verdict →
    * PII-free → encoding-healthy) as CUMULATIVE conjunctions, plus
    * the end-to-end yield rate. Ordering matters and is fixed:
    * each stage's count is "survived everything up to here", so the
    * columns read as the funnel narrowing left to right.
    *
    * Scale shape: every gate is a per-row expression
    * ([[qualityVerdict]], [[withPii]], the [[encodingHealth]]
    * character classes) — one corpus scan, one ≤|sources|
    * aggregation, integer counts and a single division.
    */
  def curationFunnel(df: DataFrame, sourceCol: String,
                     textCol: String): DataFrame = {
    val p = withPii(qualityVerdict(df, textCol), textCol)
    val e = EncodingClasses(col(textCol))
    val healthy = e.nRepl === 0 && e.nCtrl === 0 && e.nAscii * 5 >= e.nChars * 4
    p.withColumn("pass_q", col("keep") === 1)
      .withColumn("pass_p", col("pass_q") && col("has_pii") === 0)
      .withColumn("pass_e", col("pass_p") && healthy)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass_q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("pass_p"), 1L).otherwise(0L)).as("n_no_pii"),
        sum(when(col("pass_e"), 1L).otherwise(0L)).as("n_clean"))
      .withColumn("yield_rate",
        col("n_clean").cast("double") / col("n_docs"))
  }

  /** Tokenizer fertility table — the bytes-per-token economics that
    * size token budgets across sources/languages: per source, total
    * chars, whitespace-token and BPE-ish subword counts
    * ([[subwordCountCol]]), and the two fertility ratios
    * (chars/token, chars/subword) plus subwords-per-word — the
    * number a mixture planner multiplies byte masses by before
    * token-budget math, and the per-source drift signal when a
    * tokenizer change lands. Pure per-row counts + one ≤|sources|
    * aggregation; ratios are single exact-integer divisions.
    */
  def tokenizerFertility(df: DataFrame, sourceCol: String,
                         textCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("nc"),
        tokenCountCol(col(textCol)).cast("long").as("nw"),
        subwordCountCol(col(textCol)).cast("long").as("ns"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("chars"),
        sum("nw").as("words"), sum("ns").as("subwords"))
      .select(col("source"), col("n_docs"), col("chars"), col("words"),
        col("subwords"),
        (col("chars").cast("double") / col("words")).as("chars_per_word"),
        (col("chars").cast("double") / col("subwords")).as("chars_per_subword"),
        (col("subwords").cast("double") / col("words")).as("fertility"))

  /** Encoding character classes shared by [[encodingHealth]] and
    * [[curationFunnel]] — one definition so the funnel's `pass_e`
    * gate cannot desynchronize from the audit's classes. Regexes stay
    * in the Java∩RE2 common subset (the q90 discipline; `\\s` avoided
    * because engines disagree on vertical tab).
    */
  private final case class EncodingClasses(t: Column) {
    val nChars: Column = length(t)
    val nRepl: Column = nChars - length(translate(t, "�", ""))
    val nCtrl: Column = nChars -
      length(regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))
    val nAscii: Column = length(regexp_replace(t, "[^\\x20-\\x7E\\t\\n\\r]", ""))
  }

  /** Encoding-health audit — the mojibake/control-character filter
    * every web-crawl pipeline runs before text enters the mix
    * (CCNet/RefinedWeb-style): per source, documents carrying U+FFFD
    * replacement characters (the decoder's "I gave up" marker),
    * documents with C0 control characters (binary-in-text leakage),
    * documents failing an 80 % printable-ASCII floor (exact integer
    * comparison `5·n_ascii ≥ 4·n_chars` — no float threshold), and
    * the corpus-level ASCII mass ratio.
    *
    * Scale shape: pure per-row character classes (regex in the
    * Java∩RE2 common subset, the q90 discipline — `\\s` is avoided
    * because the engines disagree on vertical tab) + one ≤|sources|
    * aggregation.
    */
  def encodingHealth(df: DataFrame, sourceCol: String,
                     textCol: String): DataFrame = {
    val e = EncodingClasses(col(textCol))
    df.select(col(sourceCol).as("source"), e.nChars.cast("long").as("nc"),
        e.nRepl.cast("long").as("nr"), e.nCtrl.cast("long").as("nk"),
        e.nAscii.cast("long").as("na"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nr") > 0, 1L).otherwise(0L)).as("n_mojibake"),
        sum(when(col("nk") > 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("nr") > 0 || col("nk") > 0 ||
          col("na") * 5 < col("nc") * 4, 1L).otherwise(0L)).as("n_unhealthy"),
        sum("na").as("ascii_chars"), sum("nc").as("total_chars"))
      .withColumn("ascii_ratio",
        col("ascii_chars").cast("double") / col("total_chars"))
  }

  /** Distribution-drift audit (Population Stability Index) — the
    * between-snapshots alarm a recurring ingest runs before letting a
    * new crawl into the mix: a numeric column (here: any count)
    * buckets by power-of-two magnitude (per-row bit-length — no
    * quantile sort at any scale), old/new bucket shares smooth by
    * add-one, and each bucket contributes
    * `(p_new − p_old)·ln(p_new/p_old)` to the PSI (>0.25 total is
    * the classic "investigate" fence). One ≤64-key aggregation over
    * the corpus; the share/PSI math runs on the ≤64-row histogram.
    *
    * Determinism: shares are exact integer divisions; `ln` of
    * identical doubles agrees across engines and the contribution
    * snaps to floor·2²⁰ fixed point (the q98 recipe), so the PSI is
    * an integer sum any engine reproduces.
    */
  def distributionDrift(df: DataFrame, valueCol: Column,
                        isNew: Column): DataFrame = {
    val hist = df.select(valueCol.cast("long").as("n"),
        isNew.cast("boolean").as("nu"))
      .withColumn("bucket",
        when(col("n") <= 1, lit(0))
          .otherwise(length(bin(col("n") - 1))).cast("int"))
      .groupBy("bucket")
      .agg(sum(when(!col("nu"), 1L).otherwise(0L)).as("n_old"),
        sum(when(col("nu"), 1L).otherwise(0L)).as("n_new"))
    // ≤64 histogram rows: the single-partition window is free
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    hist
      .withColumn("tot_old", sum("n_old").over(w))
      .withColumn("tot_new", sum("n_new").over(w))
      .withColumn("nb", count(lit(1)).over(w))
      .withColumn("p_old",
        (col("n_old") + 1).cast("double") / (col("tot_old") + col("nb")))
      .withColumn("p_new",
        (col("n_new") + 1).cast("double") / (col("tot_new") + col("nb")))
      .withColumn("psi_fp",
        floor((col("p_new") - col("p_old")) * log(col("p_new") / col("p_old"))
          * 1048576.0).cast("long"))
      .select("bucket", "n_old", "n_new", "p_old", "p_new", "psi_fp")
  }

  /** Classifier calibration buckets — the reliability table for the
    * [[hashedNgramScore]] quality classifier: docs bucketed by
    * FIXED-WIDTH score intervals over the bounded [-1, 1] range
    * (never a global ntile sort — bucket membership is a per-row
    * expression, so the table costs one ≤`nb`-key aggregation at any
    * corpus size), each bucket reporting its observed positive rate
    * against its mean score. A calibrated classifier tracks the
    * diagonal; the gap is what threshold tuning and Platt-style
    * rescaling consume.
    *
    * Determinism: per-doc scores quantize to floor(mean_w·2²⁰)
    * before the cross-row sum (the integer-sum idiom), so bucket
    * means are order-immune; rates are integer-count divisions.
    */
  def calibrationBuckets(df: DataFrame, idCol: String, textCol: String,
                         label: Column, nb: Int = 10): DataFrame = {
    require(nb > 0, s"need nb > 0, got $nb")
    val labels = df.select(col(idCol).as("id"), label.cast("boolean").as("y"))
    hashedNgramScore(df, idCol, textCol)
      .join(labels, "id")
      .withColumn("mw_fp", floor(col("mean_w") * 1048576.0).cast("long"))
      .withColumn("bucket",
        least(greatest(floor((col("mean_w") + 1.0) * (nb / 2.0)).cast("int"),
          lit(0)), lit(nb - 1)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum("mw_fp").as("sum_mw_fp"))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"),
        (col("sum_mw_fp").cast("double") / 1048576.0 / col("n"))
          .as("mean_score"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each doc
    * by the log-likelihood RATIO of two hashed-n-gram bag models —
    * one fit on the `target` subset (the distribution you want more
    * of, e.g. curated sources), one on the full raw corpus. Word
    * unigrams+bigrams hash into `buckets` slots; both models are
    * add-one-smoothed multinomials over the slots; a doc's weight is
    * Σ_grams [ln p_target(b) − ln p_raw(b)], reported as a per-gram
    * mean, with `keep` thresholding at 0 (doc looks more target-like
    * than raw).
    *
    * Scale shape: the corpus is gram-expanded twice — once collapsing
    * to the `buckets`-row count table (map-side partial aggregation
    * makes the shuffle ~buckets keys per partition), once for scoring
    * against the broadcast model. Recomputing the gram pass beats
    * materializing O(corpus tokens) gram rows at 100 TB (same
    * cache-vs-recompute call as temperatureMix; see README). Both
    * models fit in one aggregation: c_raw counts every gram, c_tgt
    * counts the target-flagged ones.
    *
    * Determinism: per-slot log-probabilities collapse to fixed point
    * (floor(ln·2²⁰), the q98/unigram-logprob recipe — ln of identical
    * doubles agrees across engines, and the floor snaps away the last
    * bit), so the per-doc sum is an integer aggregation immune to
    * order; the reported mean is one final division chain.
    */
  def dsirWeight(df: DataFrame, idCol: String, textCol: String,
                 target: Column, buckets: Int = 512): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // ONE hashed_gram_hist kernel call per document (round 11): the
    // per-doc (bucket, count) histogram is the sufficient statistic
    // for BOTH sides of DSIR — the model fit explodes the (≤buckets)-
    // entry histograms instead of corpus-gram-volume rows, and the
    // per-doc score folds each histogram against the model table
    // broadcast AS AN ARRAY, so scoring is map-side only (the old
    // form shuffled every gram row into a doc-keyed aggregation).
    // Histograms are materialized once for the two consumers;
    // blocks are released by the caller's session hygiene
    // (graft.core.Materialize).
    val pre = df
      .select(col(idCol).as("id"), target.cast("int").as("tgt"),
        col(textCol).as("text"))
      .filter(col("text").rlike("\\S")) // the kernel's null (token-less) case
    // CONDITIONAL pre-kernel spread (round 12). History: round 11
    // measured an unconditional repartition at +0.4 s on a clean box
    // (q128 0.70 → 1.10 at sf0.1) and dropped it — and the driver's
    // same-day bench then recorded 1.87 s (2.68×, gc 0) on a busier
    // box, consistent with the single-row-group sf0.1 fixture feeding
    // the kernel+checkpoint pass from ONE scan partition (the fixture
    // has one parquet row group, so maxPartitionBytes cannot split
    // it). The spread now fires only when the scan genuinely cannot
    // feed the machine: plan-time partition count below the session's
    // parallelism floor. Production parquet splits at
    // maxPartitionBytes, so the exchange never fires there; the
    // single-file bench shape gets a hard parallelism floor.
    // NOTE: this plan-time decision reads the MACHINE (core count ×
    // scan partition layout), so committed plans/q128*.txt dumps are
    // host-shape-sensitive by design — regenerate them only from
    // protocol runs (local[32], sf0.1); see Bench.scala's plan-dump
    // guard.
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (pre.rdd.getNumPartitions < cores) pre.repartition(cores) else pre
    val hist = spread
      .select(col("id"), col("tgt"),
        call_function("hashed_gram_hist", col("text"), lit(buckets)).as("h"))
      .localCheckpoint()
    val cnt = hist.select(col("tgt"), explode(col("h")).as("e"))
      .groupBy(col("e.b").as("b")).agg(
        sum(col("e.c")).as("c_raw"),
        sum(col("e.c") * col("tgt")).as("c_tgt"))
    val tot = cnt.agg(sum("c_raw").as("tot_raw"), sum("c_tgt").as("tot_tgt"))
    val model = cnt.crossJoin(broadcast(tot)).select(col("b"),
      (floor(log((col("c_tgt") + 1.0) / (col("tot_tgt") + lit(buckets)))
          * 1048576.0).cast("long")
        - floor(log((col("c_raw") + 1.0) / (col("tot_raw") + lit(buckets)))
          * 1048576.0).cast("long")).as("w_fp"))
    // dense slot → w_fp array (slots absent from cnt appear in no
    // histogram, so their filler is never read); ONE row, broadcast
    val modelArr = df.sparkSession.range(buckets.toLong)
      .select(col("id").cast("int").as("b"))
      .join(model, Seq("b"), "left")
      .agg(transform(array_sort(collect_list(struct(col("b"),
        coalesce(col("w_fp"), lit(0L)).as("w")))), e => e("w")).as("warr"))
    hist.crossJoin(broadcast(modelArr))
      .select(col("id"),
        aggregate(col("h"), lit(0L), (a, e) => a + e("c")).as("n_grams"),
        aggregate(col("h"), lit(0L),
          (a, e) => a + e("c") * element_at(col("warr"), e("b") + 1))
          .as("sum_lr_fp"))
      .select(col("id"), col("n_grams"), col("sum_lr_fp"),
        (col("sum_lr_fp").cast("double") / 1048576.0 / col("n_grams"))
          .as("mean_lr"),
        when(col("sum_lr_fp") >= 0, 1).otherwise(0).as("keep"))
  }

  /** Token-level Shannon entropy per document — the "gibberish vs
    * natural text" quality signal (low entropy = repetitive spam,
    * suspiciously high = random token soup): H = ln n − (Σ c·ln c)/n
    * over the token frequency vector. Relational shape: token rows →
    * (doc, token) counts → one doc-keyed aggregation; two shuffles,
    * both with map-side partial aggregation.
    *
    * Determinism: Σ c·ln c collapses per TERM to fixed point
    * (c·floor(ln c · 2²⁰) — exact integers, order-immune); ln n is a
    * single transcendental on an identical double (engines agree on
    * one call; it's the cross-ROW accumulation of doubles that
    * diverges, and there is none here).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // map-only (round 11): the token frequency vector is per-doc
    // state — gram_counts emits it as one kernel call and the three
    // aggregates become array folds over it; both shuffles of the
    // (doc, token)-count row form disappear. Fold expressions are the
    // textually identical per-term terms (Spark evaluates the same
    // java.lang.Math.log), so every integer matches the row form.
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      // the kernel's null (token-less) case, as a scan-pushed
      // predicate so the kernel itself is never evaluated twice
      .filter(col("text").rlike("\\S"))
      .repartition(col("id"))
      .select(col("id"),
        call_function("gram_counts", col("text"), lit(1)).as("h"))
      .select(col("id"),
        aggregate(col("h"), lit(0L), (a, e) => a + e("tf")).as("n_tokens"),
        size(col("h")).cast("long").as("n_distinct"),
        aggregate(col("h"), lit(0L), (a, e) => a + e("tf")
          * floor(log(e("tf").cast("double")) * 1048576.0).cast("long"))
          .as("sum_clnc_fp"))
      .select(col("id"), col("n_tokens"), col("n_distinct"),
        // floor-snap to 1e-6: ln(n) is the one transcendental here and
        // JVM vs DuckDB libm disagree in the last ulp (~1e-16) —
        // everything else in the chain is integer-exact
        (floor((log(col("n_tokens").cast("double"))
          - (col("sum_clnc_fp").cast("double") / 1048576.0)
            / col("n_tokens")) * 1000000.0).cast("double") / 1000000.0)
          .as("entropy"))
  }

  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // map-only (round 11): both gram orders' frequency vectors come
    // from one gram_counts kernel call each, and the four Gopher
    // repetition ratios are array folds over them — the two
    // (doc, gram)-count shuffles AND the id-keyed join of the
    // two-pass row form disappear. A doc has a 2-gram table iff it
    // has a 1-gram table (1-token docs emit their partial shingle),
    // so the single rlike gate replays the join's membership.
    graft.functions.GraftFunctions.register(df.sparkSession)
    def total(h: Column) = aggregate(h, lit(0L), (a, e) => a + e("tf"))
    def top(h: Column) = array_max(transform(h, e => e("tf")))
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      .filter(col("text").rlike("\\S"))
      .repartition(col("id"))
      .select(col("id"),
        call_function("gram_counts", col("text"), lit(1)).as("h1"),
        call_function("gram_counts", col("text"), lit(2)).as("h2"))
      // each fold ONCE per table: repeated total(h1) calls would
      // build distinct lambda trees that defeat CSE — every doc
      // would traverse its tf table per reference
      .select(col("id"), total(col("h1")).as("t1"),
        size(col("h1")).as("d1"), top(col("h1")).as("m1"),
        total(col("h2")).as("t2"), top(col("h2")).as("m2"))
      .select(col("id"),
        col("t1").as("n_tok"),
        (col("d1").cast("double") / col("t1")).as("distinct_token_ratio"),
        (col("m1").cast("double") / col("t1")).as("top_unigram_frac"),
        (col("m2").cast("double") / col("t2")).as("top_bigram_frac"))
  }

  /** Bigram LM scoring with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the published
    * web-scale smoothing that deliberately drops normalization):
    * per scored bigram,
    *
    *   S(w₂|w₁) = c(w₁w₂)/c(w₁)                 if the TRAIN corpus saw the bigram
    *            = 0.4·(c(w₂)+1)/(N+V)           otherwise (add-one unigram
    *                                             backoff; covers OOV w₂ at c=0)
    *
    * fit on `train`, scored on `score` — the held-out shape is the
    * point: a model fit on its own scoring corpus never backs off
    * (every bigram is seen by construction) and the n_backoff column
    * would be dead. This is the CCNet/KenLM perplexity-filter pattern
    * one rung up from [[unigramLogProb]]'s q98: fit on trusted text,
    * score crawl text, filter on mean log-score.
    *
    * Determinism: the q98 fixed-point convention — every log factors
    * through `floor(ln(ratio-of-exact-integers)·2²⁰)` per MODEL ENTRY
    * (or per backoff row), summed as BIGINT, one double division at
    * the end.
    *
    * Scale shape: the bigram model is corpus-sized — it is NEVER
    * broadcast; scoring meets it in a shuffle equi-join on the gram
    * string, the unigram side joins on w₂ the same way, and the only
    * broadcast is the 1-row totals frame. Work is linear in train +
    * score tokens; shuffles key on gram/doc-id.
    */
  def bigramLogProb(train: DataFrame, score: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val Fp = 1048576.0 // 2^20, the q98 quantum
    // kernel-counted rows throughout: corpus counts by Σ tf, scoring
    // sums tf-weighted (see unigramLogProb) — the model-fit shuffles
    // and the scoring joins all move one row per (doc, gram)
    val uniCnt = Dedup.gramCountRows(train, idCol, textCol, n = 1)
      .groupBy("s").agg(sum("tf").as("c"))
    val totals = uniCnt.agg(sum("c").as("n_tot"), count(lit(1)).as("vocab"))
    def bigrams(df: DataFrame): DataFrame =
      Dedup.gramCountRows(df, idCol, textCol, n = 2)
        .filter(col("s").contains(" ")) // drops single-token docs' degenerate row
    val bigModel = bigrams(train)
      .groupBy("s").agg(sum("tf").as("cb"))
      .withColumn("w1", substring_index(col("s"), " ", 1))
      .join(uniCnt.select(col("s").as("w1"), col("c").as("c1")), "w1")
      .select(col("s"),
        floor(log(col("cb") / col("c1")) * Fp).cast("long").as("lp_big_fp"))
    bigrams(score)
      .select(col("id"), col("s"), col("tf"),
        substring_index(col("s"), " ", -1).as("w2"))
      .join(bigModel, Seq("s"), "left")
      .join(uniCnt.select(col("s").as("w2"), col("c").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"), col("tf"),
        coalesce(col("lp_big_fp"),
          floor(log(lit(0.4) * (coalesce(col("c2"), lit(0L)) + lit(1.0))
            / (col("n_tot") + col("vocab"))) * Fp).cast("long")).as("lp_fp"),
        col("lp_big_fp").isNull.cast("long").as("backoff"))
      .groupBy("id")
      .agg(sum("tf").as("n_bigrams"),
        sum(col("tf") * col("backoff")).as("n_backoff"),
        sum(col("tf") * col("lp_fp")).as("sum_fp"))
      .select(col("id"), col("n_bigrams"), col("n_backoff"),
        (col("sum_fp").cast("double") / Fp / col("n_bigrams")).as("mean_logs"))
  }

  /** Stupid Backoff trigram scoring — the web-scale n-gram LM of
    * Brants et al. (EMNLP 2007, "Large Language Models in Machine
    * Translation"): no discounting, no normalization — score
    * S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂) when the trigram was seen, else
    * α·c(w₂w₃)/c(w₂), else α²·(c(w₃)+1)/(N+V) (the [[bigramLogProb]]
    * (q132) add-one floor at the unigram level so unseen words score finitely)
    * with the published α = 0.4. Brants' point was exactly the 100 TB
    * posture: Stupid Backoff needs only COUNTS — map-side-partial
    * groupBys and gram-keyed equi-joins — where Kneser–Ney needs
    * context-type statistics that don't distribute as cheaply, and at
    * web scale the quality gap closes.
    *
    * Completes the LM-quality ladder (q98 unigram → q132 bigram →
    * this): per doc, the mean token log-score plus how often each
    * backoff level fired — the n_uni_backoff share is itself a
    * quality/OOD signal (garbage text never hits the trigram model).
    *
    * Determinism: each level's score collapses to fixed point in ONE
    * ln — the α / α² multipliers ride INSIDE the ln argument — so
    * per-doc sums add exact integers (the q98/q142 contract).
    *
    * Scale shape: three count tables (tri/bi/uni) shuffle once each on
    * the gram key with map-side partials; scoring is three gram-keyed
    * left joins + one broadcast of the two global totals; everything
    * moves one row per (doc, gram-type).
    */
  def stupidBackoffScore(train: DataFrame, score: DataFrame,
                         idCol: String, textCol: String,
                         alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val Fp = 1048576.0 // 2^20, the q98 quantum
    def grams(df: DataFrame, n: Int): DataFrame =
      Dedup.gramCountRows(df, idCol, textCol, n)
        .filter(size(split(col("s"), " ")) === n) // full grams only
    val uniCnt = Dedup.gramCountRows(train, idCol, textCol, n = 1)
      .groupBy("s").agg(sum("tf").as("c"))
    val totals = uniCnt.agg(sum("c").as("n_tot"), count(lit(1)).as("vocab"))
    val bigCnt = grams(train, 2).groupBy("s").agg(sum("tf").as("cb"))
    val triModel = grams(train, 3).groupBy("s").agg(sum("tf").as("ct"))
      .withColumn("w12", substring_index(col("s"), " ", 2))
      .join(bigCnt.select(col("s").as("w12"), col("cb").as("c12")), "w12")
      .select(col("s"),
        floor(log(col("ct") / col("c12")) * Fp).cast("long").as("lp_tri_fp"))
    grams(score, 3)
      .select(col("id"), col("s"), col("tf"),
        substring_index(col("s"), " ", -2).as("w23"),
        element_at(split(col("s"), " "), 2).as("w2"),
        substring_index(col("s"), " ", -1).as("w3"))
      .join(triModel, Seq("s"), "left")
      .join(bigCnt.select(col("s").as("w23"), col("cb").as("c23")),
        Seq("w23"), "left")
      .join(uniCnt.select(col("s").as("w2"), col("c").as("c2")),
        Seq("w2"), "left")
      .join(uniCnt.select(col("s").as("w3"), col("c").as("c3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"), col("tf"),
        coalesce(
          col("lp_tri_fp"),
          // seen-bigram backoff needs BOTH counts; c2 can only be null
          // when c23 is (a bigram's words are each in the vocab), so
          // gating on c23 alone suffices
          when(col("c23").isNotNull,
            floor(log(lit(alpha) * col("c23") / col("c2")) * Fp).cast("long")),
          floor(log(lit(alpha * alpha) * (coalesce(col("c3"), lit(0L)) + lit(1.0))
            / (col("n_tot") + col("vocab"))) * Fp).cast("long")).as("lp_fp"),
        when(col("lp_tri_fp").isNotNull, lit(0))
          .when(col("c23").isNotNull, lit(1)).otherwise(lit(2)).as("lvl"))
      .groupBy("id")
      .agg(sum("tf").as("n_trigrams"),
        sum(when(col("lvl") === 1, col("tf")).otherwise(0L)).as("n_big_backoff"),
        sum(when(col("lvl") === 2, col("tf")).otherwise(0L)).as("n_uni_backoff"),
        sum(col("tf") * col("lp_fp")).as("sum_fp"))
      .select(col("id"), col("n_trigrams"), col("n_big_backoff"),
        col("n_uni_backoff"),
        (col("sum_fp").cast("double") / Fp / col("n_trigrams")).as("mean_logs"))
  }

  /** HTML extraction — the ingest-side boilerplate strip every
    * crawl-derived corpus passes through before any quality/dedup
    * stage: drop `<script>`/`<style>` blocks WHOLESALE (their text is
    * code, not prose), drop comments, strip remaining tags, decode
    * the five predefined XML entities, collapse whitespace. Pure
    * per-row codegen'd column work — no shuffle, no UDF. Regexes are
    * Java∩RE2-portable (the [[withPii]] constraint, so the DuckDB
    * oracle replays them verbatim): `(?s)` DOTALL prefix instead of
    * flags arguments, no backreferences, non-greedy block bodies.
    * Entity decode order matters: `&amp;` LAST, or `&amp;lt;` would
    * double-decode — both engines apply the same chain.
    */
  def htmlExtractCol(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[htmlExtractCol]] over a frame: (id, clean text + audit
    * columns). `kept_frac` is the extraction yield — the boilerplate
    * share is a standard crawl-quality signal (near-zero yield =
    * navigation page). */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(htmlCol).as("html"))
      .withColumn("clean", htmlExtractCol(col("html")))
      .select(col("id"), col("clean"),
        length(col("clean")).as("n_chars_clean"),
        (length(col("clean")).cast("double") / length(col("html")))
          .as("kept_frac"))

  /** Grouped EXACT quantiles by nearest rank — the corpus-report
    * primitive (doc-length distribution per source is the first table
    * in every dataset card). Nearest-rank selection, not
    * interpolation: the k-th smallest value with k = ⌈p·n⌉, computed
    * in INTEGER arithmetic (`(n·num + den − 1) div den`) so there is
    * no float p·n to round differently across engines — the result is
    * an actual corpus value, bit-exact everywhere.
    *
    * Why not `percentile_approx`: at 100 TB the approx sketch is the
    * right default for dashboards, but its output is
    * algorithm-defined (GK sketch internals), so no independent
    * engine can verify it. This exact form costs ONE per-group sort
    * (window) — for the grouped-report shape (many small groups) the
    * sort parallelizes across groups and is cheap; for a single
    * billion-row group reach for the sketch and give up the oracle.
    *
    * `quantiles` are (label, numerator) with denominator 100, e.g.
    * ("p50", 50). One window pass; one filter per requested quantile
    * over the same frame; one conditional aggregation selects every
    * quantile (round 12: the earlier per-quantile filter+join fold
    * re-executed the ranked pipeline once per quantile and its
    * equi-joins dropped NULL groups — a groupBy keeps them). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       quantiles: Seq[(String, Int)]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = max(col("_n")).as("n_docs") +:
      nearestRankAgg("_rn", "_n", valueCol, quantiles)
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Robust per-group statistics — the dataset-card mean that a few
    * pathological rows cannot move: quantile-fenced TRIMMED mean
    * (rows outside the [p, 100−p] nearest-rank fences dropped) and
    * WINSORIZED mean (rows clamped to the fences — Tukey/Winsor, the
    * standard robust pair). Fences come from [[groupedQuantiles]]'s
    * integer nearest-rank selection, so both engines pick the
    * identical corpus values and every sum is exact integer
    * arithmetic; the means are one division at the end.
    *
    * Fence-based (not count-based) trimming on purpose: dropping
    * exactly k rows per side needs a global tie-break ordering per
    * group, where the fence form needs only the two quantile values —
    * one broadcast join, one aggregation, and identical semantics in
    * any engine.
    *
    * Scale shape: one window per group for the fences (bounded by the
    * group count — generalize continuous group keys first, the
    * [[kAnonymityCensus]] contract), then a broadcast fence join and
    * ONE map-side-partial aggregation over the corpus.
    */
  def robustGroupStats(df: DataFrame, groupCol: String, valueCol: String,
                       trimPct: Int = 10): DataFrame = {
    require(trimPct > 0 && trimPct < 50,
      s"trimPct must be in (0, 50), got $trimPct")
    // integral values only: the exact-integer-sum contract is the
    // whole point, and silently flooring a DoubleType column into the
    // long sums (while fencing on the exact values) would bias both
    // means with no error — fail loud at the API boundary instead;
    // fixed-point-scale fractional columns upstream (the q98 pattern)
    val vt = df.schema(valueCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vt),
      s"robustGroupStats: $valueCol is $vt — integral columns only " +
        "(scale fractional values to fixed point first)")
    val fences = groupedQuantiles(df.select(col(groupCol), col(valueCol)),
        groupCol, valueCol,
        Seq(("lo", trimPct), ("hi", 100 - trimPct)))
      .select(col(groupCol), col("lo"), col("hi"))
    df.select(col(groupCol), col(valueCol))
      .join(broadcast(fences), groupCol)
      .withColumn("_w",
        greatest(least(col(valueCol), col("hi")), col("lo")).cast("long"))
      .withColumn("_in", col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        first("lo").as("lo"), first("hi").as("hi"),
        sum(when(col("_in"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_in"), col(valueCol).cast("long")).otherwise(0L))
          .as("trim_sum"),
        sum(col("_w")).as("wins_sum"))
      .withColumn("trim_mean",
        col("trim_sum").cast("double") / col("n_kept"))
      .withColumn("wins_mean", col("wins_sum").cast("double") / col("n"))
  }

  /** Nearest-rank selection as conditional-aggregation columns: for
    * each (label, num) pick the value whose rank equals
    * ⌈n·num/100⌉ (integer form `(n·num + 99) div 100` — no float
    * p·n). Shared by [[groupedQuantiles]] and
    * `Sketches.bottomKQuantiles`; exactly one row per group matches
    * each rank when num ∈ [1, 100] (validated — an out-of-range
    * numerator would otherwise yield a silent NULL column).
    */
  private[llm] def nearestRankAgg(rankCol: String, nCol: String,
                                  valCol: String,
                                  quantiles: Seq[(String, Int)]): Seq[Column] = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, n) => n >= 1 && n <= 100 },
      s"quantile numerators must be in [1, 100], got $quantiles")
    quantiles.map { case (label, num) =>
      max(when(col(rankCol) === expr(s"($nCol * $num + 99) div 100"),
        col(valCol))).as(label)
    }
  }

  /** Vocabulary coverage curve — the report every tokenizer design
    * starts from: token types ranked by corpus frequency with exact
    * cumulative occurrence share in floor-2²⁰ fixed point, answering
    * "how much of the corpus do the top-k types cover?" (the
    * OOV-rate/vocab-size trade). Cap-or-bucket shape (round 12):
    * the top `topK` types are individual rows (rank ties break by
    * token text, so the head is unique); everything below the cap is
    * aggregated into one row per DISTINCT FREQUENCY, carrying the
    * rank span `[rank_lo, rank_hi]`, the type count, and the exact
    * cumulative occurrence total at `rank_hi` — because all types in
    * a bucket share one frequency, the cumulative at the bucket edge
    * is independent of their within-bucket (token-text) order, so
    * the curve loses nothing a reader of a coverage table uses.
    *
    * Scale shape: one token aggregation (map-side partials), a
    * `TakeOrdered` top-K for the head (no full sort — O(K) heap per
    * partition), a broadcast anti-join of the K head tokens, and a
    * map-side-partial groupBy(cnt) for the tail. The only windows
    * run over (a) ≤ `topK` head rows and (b) one row per distinct
    * tail frequency — the latter is provably ≤ √(2·total_tokens)
    * rows for ANY corpus (d distinct frequencies need ≥ d(d+1)/2
    * occurrences), i.e. ≤ ~14 M rows even at 10¹⁴ tokens, and
    * Zipfian reality is thousands; coarsen the bucket key to
    * ⌊log₂ cnt⌋ if an adversarial corpus ever pushes that bound.
    * Unlike the pre-round-12 form, NO window ever spans the type
    * inventory itself (billions of rows on a web corpus).
    *
    * Head rows have `rank_lo = rank_hi` and `n_types = 1`; tail
    * bucket rows have `tok = NULL`. `cum_share_fp` =
    * ⌊cum_cnt·2²⁰ / total⌋, exact in integer arithmetic end-to-end.
    */
  def vocabCoverage(df: DataFrame, textCol: String = "text",
                    topK: Int = 1000): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    // the vocab table feeds THREE consumers (head top-K, tail
    // anti-join, totals) — checkpoint it so the corpus token pass
    // runs once, not once per branch; blocks released by the
    // caller's session hygiene (graft.core.Materialize)
    val counts = df
      .select(explode(tokensCol(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = counts.agg(sum("cnt").as("total")) // 1 row, broadcast
    // head: global top-K by (cnt desc, tok) via TakeOrdered; the
    // rank/cumsum window then spans ≤ topK rows by construction
    val head = counts.orderBy(col("cnt").desc, col("tok")).limit(topK)
    val wHead = Window.orderBy(col("cnt").desc, col("tok"))
    val headRanked = head
      .withColumn("rank", row_number().over(wHead).cast("long"))
      .withColumn("cum_cnt", sum("cnt").over(
        wHead.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // 1-row head summary: rank offset + occurrence offset for the tail
    val headStats = headRanked.agg(
      coalesce(max("rank"), lit(0L)).as("n_head"),
      coalesce(max("cum_cnt"), lit(0L)).as("head_cum"))
    // tail: every type below the cap, bucketed by its exact frequency
    val tailBuckets = counts
      .join(broadcast(headRanked.select("tok")), Seq("tok"), "left_anti")
      .groupBy("cnt").agg(count(lit(1)).as("n_types"))
      .withColumn("occ", col("cnt") * col("n_types"))
    val wTail = Window.orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tailRows = tailBuckets
      .withColumn("cum_types", sum("n_types").over(wTail))
      .withColumn("cum_occ", sum("occ").over(wTail))
      .crossJoin(broadcast(headStats))
      .select(
        (col("n_head") + col("cum_types") - col("n_types") + 1).as("rank_lo"),
        (col("n_head") + col("cum_types")).as("rank_hi"),
        lit(null).cast("string").as("tok"),
        col("cnt"), col("n_types"),
        (col("head_cum") + col("cum_occ")).as("cum_cnt"))
    val headRows = headRanked.select(
      col("rank").as("rank_lo"), col("rank").as("rank_hi"),
      col("tok"), col("cnt"), lit(1L).as("n_types"), col("cum_cnt"))
    headRows.unionAll(tailRows)
      .crossJoin(broadcast(totals))
      // widened share arithmetic: cum_cnt·2²⁰ overflows BIGINT past
      // ~2⁴³ total tokens, inside the documented 10¹⁴-token envelope —
      // the product rides DECIMAL(38,0) (the oracle mirrors with
      // HUGEINT), and the quotient ≤ 2²⁰ drops back to BIGINT exactly
      .select(col("rank_lo"), col("rank_hi"), col("tok"), col("cnt"),
        col("n_types"), col("cum_cnt"),
        expr("cast((cast(cum_cnt as decimal(38,0)) * 1048576) div total as bigint)")
          .as("cum_share_fp"))
  }

  /** Robust per-group outlier report — median/MAD instead of
    * mean/stddev, so a handful of monster documents cannot drag the
    * fence they are judged against (the failure mode of z-score
    * filters on crawl data). A value is an outlier iff
    * `|x − median| > c·MAD`, everything in the integer domain of the
    * input column: nearest-rank medians pick ACTUAL corpus values
    * (via [[groupedQuantiles]]), deviations and the fence stay exact
    * integers, so any engine replays the verdict bit-for-bit.
    *
    * Scale shape: two group-keyed window passes (value rank, then
    * deviation rank) and two joins against per-group 1-row tables —
    * both explicitly broadcast; the corpus itself shuffles only on
    * the group key, twice. Output per group: n_docs, med, mad,
    * n_outliers, outlier_mass (the value sum carried by outliers).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  c: Int = 3): DataFrame = {
    require(c > 0, s"fence multiplier must be positive, got $c")
    val med = groupedQuantiles(
        df.select(col(groupCol), col(valueCol)), groupCol, valueCol,
        Seq(("med", 50)))
      .select(col(groupCol), col("med"))
    val dev = df.select(col(groupCol), col(valueCol))
      .join(broadcast(med), groupCol)
      .withColumn("_dev", abs(col(valueCol) - col("med")))
    val mad = groupedQuantiles(
        dev.select(col(groupCol), col("_dev")), groupCol, "_dev",
        Seq(("mad", 50)))
      .select(col(groupCol), col("mad"))
    dev.join(broadcast(mad), groupCol)
      .withColumn("_out", col("_dev") > lit(c.toLong) * col("mad"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        first("med").as("med"),
        first("mad").as("mad"),
        sum(when(col("_out"), 1L).otherwise(0L)).as("n_outliers"),
        coalesce(sum(when(col("_out"), col(valueCol).cast("long"))), lit(0L))
          .as("outlier_mass"))
  }

  /** Zipf power-law fit — the corpus-health audit that catches
    * template spam and synthetic-data collapse (natural language has
    * log-log slope ≈ −1 over the frequency head; machine-generated
    * boilerplate flattens it, token soup steepens it): OLS of
    * ln(freq) on ln(rank) over the TOP-K vocabulary head. Head-only
    * by design — Zipf's law is a head phenomenon, the integer-count
    * tail plateaus into ties that carry no slope information — and
    * head-only is also what makes the plan scale-safe: the global
    * top-K lands via `TakeOrdered` (per-partition heaps, no full
    * vocab sort), so no window ever spans the type inventory (same
    * discipline as [[vocabCoverage]]).
    *
    * Determinism: ln values snap to ⌊ln·2¹⁰⌋ fixed point (ln of
    * identical integers agrees across engines; the floor removes the
    * last bit), all OLS moments are then EXACT integer sums — 2¹⁰
    * keeps n·Σxy inside a long for any topK ≤ 100k — and slope/r²
    * are single double divisions of exact integers at the end.
    * Ranking ties break on the token string, so rank assignment is
    * total and any engine reproduces it.
    *
    * Output (one row): `n_terms` (actual head size), `slope`, `r2`,
    * plus the exact fixed-point moments for downstream auditing.
    */
  def zipfFit(df: DataFrame, textCol: String = "text",
              topK: Int = 1000): DataFrame = {
    require(topK > 1, s"need topK > 1 for a slope, got $topK")
    val counts = df
      .select(explode(tokensCol(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val head = counts.orderBy(col("cnt").desc, col("tok")).limit(topK)
    val wHead = Window.orderBy(col("cnt").desc, col("tok"))
    val ranked = head
      .withColumn("rank", row_number().over(wHead).cast("long"))
      .select(
        floor(log(col("rank").cast("double")) * 1024.0).cast("long").as("x"),
        floor(log(col("cnt").cast("double")) * 1024.0).cast("long").as("y"))
    ranked.agg(
        count(lit(1)).as("n_terms"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_terms"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        (col("n_terms") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_terms") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("n_terms") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n_terms"),
        (col("num").cast("double") / col("den").cast("double")).as("slope"),
        ((col("num").cast("double") * col("num").cast("double"))
          / (col("den").cast("double") * col("deny").cast("double"))).as("r2"),
        col("sx"), col("sy"), col("sxy"), col("sxx"))
  }

  /** PMI collocations — the classic phrase/compound extractor
    * (Church & Hanks 1990; the word2vec-phrases preprocessing step):
    * adjacent token pairs scored by pointwise mutual information
    * PMI = ln(c_ab·N²/(B·c_a·c_b)), high when a bigram occurs far
    * more than its parts' independence predicts ("fast scan" vs
    * "the the"). `minCount` drops singleton noise (PMI is maximal
    * for hapax pairs by construction); top-k on (PMI desc, pair asc).
    *
    * Determinism: every ln argument is an EXACT integer count, each
    * term snaps to ⌊ln·2²⁰⌋ fixed point separately, and the score is
    * their integer sum — no double addition anywhere, so any engine
    * reproduces the ranking bit-for-bit (the q98 ln-parity contract).
    *
    * Scale shape: one gram-keyed pair aggregation
    * ([[graft.llm.Dedup.adjacentPairCounts]], kernel-counted rows,
    * map-side partials), one token-keyed unigram aggregation
    * (checkpointed — it feeds both joins and the total), two hash
    * joins keyed on the token, two 1-row scalar broadcasts (N, B),
    * and a TakeOrdered top-k. Nothing collects; nothing is
    * all-pairs.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Int = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1, s"need minCount/k >= 1, got $minCount/$k")
    def fl(x: Column): Column =
      floor(log(x.cast("double")) * 1048576.0).cast("long")
    val uni = df.select(explode(tokensCol(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .localCheckpoint()
    val nRow = uni.agg(sum("cw").as("n_tokens"))
    val all = Dedup.adjacentPairCounts(df, idCol, textCol)
    val bRow = all.agg(sum("n_occ").as("n_bigrams"))
    all.filter(col("n_occ") >= minCount)
      .withColumn("w1", split(col("pair"), " ")(0))
      .withColumn("w2", split(col("pair"), " ")(1))
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .crossJoin(broadcast(nRow)).crossJoin(broadcast(bRow))
      .withColumn("pmi_fp",
        fl(col("n_occ")) + lit(2L) * fl(col("n_tokens"))
          - fl(col("n_bigrams")) - fl(col("c1")) - fl(col("c2")))
      .withColumn("pmi", col("pmi_fp").cast("double") / 1048576.0)
      .select(col("pair"), col("n_occ"), col("n_docs"), col("c1"),
        col("c2"), col("pmi_fp"), col("pmi"))
      .orderBy(col("pmi_fp").desc, col("pair"))
      .limit(k)
  }

  /** Cohen's kappa between two binary labelers — the agreement audit
    * run before trusting any pair of quality/safety classifiers on
    * the same corpus (raw percent agreement flatters imbalanced
    * labels; kappa corrects for chance). One map-side-partial
    * aggregation over the corpus; every moment is an exact integer
    * count, kappa is one double division of exact integers:
    * κ = (n·po_cnt − pe_num) / (n² − pe_num) with
    * pe_num = n₁ₐ·n₁ᵦ + n₀ₐ·n₀ᵦ. NULL labels are rejected up front
    * (an unlabeled row belongs in neither the numerator nor the
    * chance model). κ is NULL when chance agreement is 1 (both
    * labelers constant — n² = pe_num, the denominator vanishes and
    * agreement-beyond-chance is undefined).
    */
  def classifierAgreement(df: DataFrame, labelA: Column,
                          labelB: Column): DataFrame = {
    val base = df.select(labelA.cast("int").as("a"), labelB.cast("int").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    base.agg(
        count(lit(1)).as("n"),
        sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n10"),
        sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)).as("n01"),
        sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L)).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        ((col("n11") + col("n10")) * (col("n11") + col("n01"))
          + (col("n01") + col("n00")) * (col("n10") + col("n00"))).as("pe_num"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("n") * col("n") =!= col("pe_num"),
          (col("n") * (col("n11") + col("n00")) - col("pe_num")).cast("double")
            / (col("n") * col("n") - col("pe_num")).cast("double"))
          .as("kappa"))
  }

  /** Lexicon tagging — the bad-words / safety-term / watchlist filter
    * every curation pipeline runs: per document, occurrence counts of
    * a constant term list in ONE Aho–Corasick pass
    * ([[graft.functions.AhoCorasick]], the `ac_term_hits` kernel)
    * where the naive form is K separate `instr`/regexp scans of the
    * same text — a K× scan-cost multiplier at 100 TB for the
    * hundreds-of-entries lists these filters actually use.
    *
    * Matching contract: SUBSTRING semantics on exact chars, every
    * occurrence counted (overlaps and nested terms included — "scan"
    * inside "scan slow" hits both). Callers wanting word boundaries
    * pad terms with spaces; wanting case folding, lower() the column
    * and the lexicon. NULL text reads as empty text (row preserved,
    * zero hits). Terms must be distinct and non-empty (plan-time
    * failure otherwise).
    *
    * Output per doc: `n_hits` (total occurrences), `n_terms`
    * (distinct lexicon entries hit), `top_term`/`top_count` (the
    * most frequent term, ties to the smallest lexicon index; NULL
    * for hit-less docs).
    *
    * Scale shape: per-row kernel + array folds — NO shuffle at all;
    * the plan is scan → project. Everything downstream (filtering on
    * n_hits, joining tags) composes relationally.
    */
  def lexiconTag(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val tl = typedLit(terms)
    val tagged = df.select(col(idCol).as("id"),
      call_function("ac_term_hits",
        coalesce(col(textCol), lit("")), tl).as("h"))
    // argmax as an array fold: max (c, -t) struct = highest count,
    // then smallest index — deterministic on any engine
    tagged.select(col("id"),
        col("h"),
        array_max(transform(col("h"),
          e => struct(e.getField("c").as("c"),
            (-e.getField("t")).as("nt")))).as("_top"))
      .select(col("id"),
        aggregate(col("h"), lit(0L), (a, e) => a + e.getField("c"))
          .as("n_hits"),
        size(col("h")).as("n_terms"),
        element_at(tl, (-col("_top.nt")) + 1).as("top_term"),
        col("_top.c").as("top_count"))
  }

  /** Corpus-level lexicon statistics — the companion report of
    * [[lexiconTag]]: per lexicon term, total occurrences and document
    * frequency, INCLUDING zero-hit terms (a curation run needs to see
    * which blocklist entries never fire). One kernel pass per doc,
    * one explode bounded by hit volume, one |lexicon|-key aggregation
    * (bounded-width shuffle), and a left join against the |lexicon|-
    * row inventory — nothing scales with corpus size except the scan.
    */
  def lexiconTermStats(df: DataFrame, textCol: String,
                       terms: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val tl = typedLit(terms)
    val hits = df
      .select(call_function("ac_term_hits",
        coalesce(col(textCol), lit("")), tl).as("h"))
      .select(explode(col("h")).as("e"))
      .groupBy(col("e.t").as("t"))
      .agg(sum(col("e.c")).as("n_occ"), count(lit(1)).as("n_docs"))
    val lex = df.sparkSession.range(terms.length)
      .select(col("id").cast("int").as("t"),
        element_at(tl, col("id").cast("int") + 1).as("term"))
    lex.join(hits, Seq("t"), "left")
      .select(col("t"), col("term"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}
