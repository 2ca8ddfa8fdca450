package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash bucketing, n-gram
  * Jaccard verification.
  *
  * 100 TB posture: every candidate generator here is *banded/bucketed*
  * — pairs are only formed inside hash buckets (shuffle on the bucket
  * key), never by an all-pairs cross join. The exact-Jaccard verify
  * stage runs on the candidate set only.
  *
  * Determinism: MinHash uses md5 hex strings ordered lexicographically
  * (seeded by an integer salt), so signatures are reproducible across
  * engines and runs — no RNG state anywhere.
  */
object Dedup {

  /** Exact dedup key: md5 of the raw text. */
  def exactKeyCol(text: Column): Column = md5(text)

  /** Exact duplicate removal (keep lowest id per hash). One hash
    * aggregation — the canonical exact-dedup plan at any scale.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(exactKeyCol(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle set of a text column (distinct). */
  def shinglesCol(text: Column, n: Int = 3): Column = {
    val w = TextAnalysis.tokensCol(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
  }

  /** MinHash signature: `numHashes` salted md5 minima over the shingle
    * set, as hex strings (lexicographic min ≡ min of the 128-bit
    * value).
    */
  def minhashSigCol(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingles, s => md5(concat(lit(k.toString), lit(":"), s))))
    }: _*)

  /** LSH band keys: split the signature into `bands` bands of
    * `rowsPerBand` and hash each band. Docs sharing any band key are
    * candidate pairs (standard banding: P(candidate) ≈ 1−(1−j^r)^b).
    */
  def bandKeysCol(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * bucket-join → exact-Jaccard verify. Returns candidate pairs
    * (id_a < id_b) with their exact shingle Jaccard, filtered at
    * `threshold`.
    *
    * Formulated *relationally* — explode shingles×salts to rows, one
    * hash aggregation for the per-salt minima, one for the band keys —
    * instead of nested array expressions per document. The nested form
    * ([[minhashSigCol]]+[[bandKeysCol]], kept for signature-level use)
    * triggers a CollapseProject expression blowup where every band key
    * re-inlines all 16 md5 minima (measured 37 s for 500 docs vs
    * sub-second relational); the row form is also the shape that
    * scales — work is linear in Σ|shingles|·numHashes, shuffles are on
    * bounded-width keys, and the verify stage runs on candidates only.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
                 shingleLen: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = df.select(col(idCol).as("id"), shinglesCol(col(textCol), shingleLen).as("sh"))

    val sigs = base
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), col("s"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("k"))
      .select(col("id"), col("k"),
        md5(concat(col("k").cast("string"), lit(":"), col("s"))).as("h"))
      .groupBy("id", "k").agg(min("h").as("mh"))

    val bandKeys = sigs
      .withColumn("band", floor(col("k") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(md5(array_join(
        transform(sort_array(collect_list(struct(col("k"), col("mh")))),
          x => x.getField("mh")), "|")).as("bkey"))

    val a = bandKeys.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = bandKeys.select(col("band"), col("bkey"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    pairs
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 16-bit SimHash from salted-md5 hex digits: bit k is the sign of
    * the per-token vote where a token votes +1 if hex digit k of its
    * md5 is ≥ 8 (the digit's MSB), −1 otherwise. Docs sharing a
    * SimHash value are near-dup candidates (bucketed, not all-pairs).
    */
  def simhashCol(text: Column, bits: Int = 16): Column = {
    val toks = TextAnalysis.tokensCol(text)
    val bitCols = (0 until bits).map { k =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(substring(md5(t), k + 1, 1) >= "8", 1).otherwise(-1))
      when(vote >= 0, lit(1L << k)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash bucket dedup: groups of docs sharing a simhash value. */
  def simhashBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(simhashCol(col(textCol)).as("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** n-gram Jaccard near-dup with prefix blocking: candidates share a
    * text-prefix block key (cheap, deterministic); exact char-n-gram
    * Jaccard verifies. The blocking key bounds the join like a band
    * key does for MinHash.
    */
  def ngramJaccardBlocked(df: DataFrame, idCol: String, textCol: String,
                          prefixLen: Int = 32, n: Int = 5,
                          threshold: Double = 0.7): DataFrame = {
    val grams = array_distinct(transform(
      sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1))),
      i => col("t").substr(i, lit(n))))
    val keyed = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("blk", substring(col("t"), 1, prefixLen))
      .withColumn("g", grams)
      .select("id", "blk", "g")
    val a = keyed.select(col("blk"), col("id").as("id_a"), col("g").as("g_a"))
    val b = keyed.select(col("blk"), col("id").as("id_b"), col("g").as("g_b"))
    a.join(b, "blk").filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("g_a")) + size(col("g_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
