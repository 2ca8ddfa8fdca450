package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Randomized parity gates for the round-11 codegen text kernels:
  * each kernel must emit EXACTLY the rows of the SQL expression form
  * it replaced (which is also what the DuckDB oracles replay). The
  * corpus fixtures are ASCII and well-formed; these tests attack the
  * edges — unicode (multi-byte, supplementary pairs), every Java
  * `\s` whitespace char (incl. vertical tab), leading/trailing
  * runs, empty/one-char/short documents.
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private val whitespace = Seq(" ", "\t", "\n", "\u000B", "\f", "\r")
  // whole symbols only — the emoji are surrogate PAIRS and must stay
  // paired to remain valid UTF-8
  private val symbols = Seq("a", "b", "c", "j", "α", "β", "δ",
    "一", "二", "五", "😀", "😁", "0", "7", "9")
  private def randDoc(seed: Int): String = {
    val r = new scala.util.Random(seed)
    val n = r.nextInt(120)
    (1 to n).map { _ =>
      if (r.nextInt(4) == 0) whitespace(r.nextInt(whitespace.size))
      else symbols(r.nextInt(symbols.size))
    }.mkString
  }

  private def docs(): DataFrame = {
    val edge = Seq("", " ", "\u000B\u000B", "x", "ab", "  padded  ",
      " nbsp is not java-space ", "ταυτο ταυτο ταυτο")
    (edge ++ (1 to 60).map(randDoc)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    assert(d1 == 0 && d2 == 0, s"$what diverged: +$d1 / -$d2 rows")
  }

  test("shingles kernel == posexplode+lead row form (n = 1, 2, 3) on unicode/whitespace edges") {
    val d = docs()
    for (n <- Seq(1, 2, 3)) {
      val kernel = Dedup.shingleRows(d, "doc_id", "text", n)
      val reference =
        if (n == 1)
          d.select(col("doc_id").as("id"),
            explode(graft.llm.TextAnalysis.tokensCol(col("text"))).as("s"))
        else {
          val w = Window.partitionBy("id").orderBy("pos")
          d.select(col("doc_id").as("id"), col("text"))
            .select(col("id"),
              posexplode(graft.llm.TextAnalysis.tokensCol(col("text")))
                .as(Seq("pos", "tok")))
            .select(col("id"), col("pos"),
              concat_ws(" ", col("tok") +:
                (1 until n).map(k => lead(col("tok"), k).over(w)): _*).as("s"),
              lead(col("tok"), n - 1).over(w).isNotNull.as("full"))
            .filter(col("full") || col("pos") === 0)
            .select(col("id"), col("s"))
        }
      assertSameRows(kernel, reference, s"shingles n=$n")
    }
  }

  test("winnow_fps kernel == md5+window row form on unicode/whitespace edges") {
    val d = docs().filter(length(col("text")) > 0)
    val (k, w) = (8, 4)
    val kernel = Dedup.winnowFingerprints(d, "doc_id", "text", k, w)
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val reference = d
      .select(col("doc_id").cast("long").as("id"), col("text").as("t"))
      .select(col("id"), col("t"),
        posexplode(sequence(lit(1),
          greatest(length(col("t")) - (k - 1), lit(1)))).as(Seq("i", "pos")))
      .select(col("id"), col("pos"),
        conv(substring(md5(substring(col("t"), col("pos"), lit(k))), 1, 15),
          16, 10).cast("long").as("h"),
        (length(col("t")) - (k - 1)).as("np"))
      .withColumn("minh", min("h").over(win))
      .filter(col("pos") <= greatest(col("np") - (w - 1), lit(1)))
      .select(col("id"), col("minh").as("fp"))
      .distinct()
    assertSameRows(kernel, reference, "winnow_fps")
  }

  test("minhash_sig kernel == shingle-row hash aggregation (signatures and shingle SETS)") {
    val d = docs()
    graft.functions.GraftFunctions.register(spark)
    val numHashes = 16
    val kernel = d
      .select(col("doc_id").as("id"),
        call_function("minhash_sig", col("text"), lit(3), lit(numHashes)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), array_sort(col("sig.sh")).as("sh"), col("sig.mh").as("mh"))
    val rows = Dedup.shingleRows(d, "doc_id", "text", 3)
    val reference = rows
      .select(col("id") +: col("s") +: (0 until numHashes).map(k =>
        Dedup.minhashAffineCol(k, Dedup.minhashBaseCol(col("s"))).as(s"h$k")): _*)
      .groupBy("id")
      .agg(array_sort(collect_set(col("s"))).as("sh"),
        array((0 until numHashes).map(k => min(col(s"h$k"))): _*).as("mh"))
    assertSameRows(kernel, reference, "minhash_sig")
  }

  test("hashed_ngram_score kernel == explode + weight-join row form (buckets = 64)") {
    val d = docs()
    graft.functions.GraftFunctions.register(spark)
    val buckets = 64
    val kernel = d
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id").as("id"),
        call_function("hashed_ngram_score", col("text"), lit(buckets)).as("hs"))
      .select(col("id"), col("hs.n_grams").as("n_grams"),
        col("hs.sum_fp").as("sum_fp"))
    // the uniBigramRows multiset: every token, then the space-joined
    // bigrams for ≥2-token docs or the single token again for 1-token
    // docs (its degenerate partial bigram); token-less docs emit none
    val bigrams = when(size(col("_t")) >= 2,
      zip_with(slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1),
        (a, b) => concat_ws(" ", a, b))).otherwise(col("_t"))
    val grams = d
      .select(col("doc_id").as("id"),
        graft.llm.TextAnalysis.tokensCol(col("text")).as("_t"))
      .select(col("id"), explode(concat(col("_t"), bigrams)).as("s"))
    val weights = spark.range(buckets.toLong).select(col("id").as("b"),
      (conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 2097153L - 1048576L).as("w_fp"))
    val reference = grams
      .select(col("id"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          % buckets).as("b"))
      .join(broadcast(weights), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), sum("w_fp").as("sum_fp"))
    assertSameRows(kernel, reference, "hashed_ngram_score")
  }

  test("hashed_gram_hist kernel == md5-bucket row form grouped (buckets = 64)") {
    val d = docs()
    graft.functions.GraftFunctions.register(spark)
    val buckets = 64
    val kernel = d
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id").as("id"),
        explode(call_function("hashed_gram_hist", col("text"), lit(buckets)))
          .as("e"))
      .select(col("id"), col("e.b").cast("long").as("b"), col("e.c").as("c"))
    val bigrams = when(size(col("_t")) >= 2,
      zip_with(slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1),
        (a, b) => concat_ws(" ", a, b))).otherwise(col("_t"))
    val reference = d
      .select(col("doc_id").as("id"),
        graft.llm.TextAnalysis.tokensCol(col("text")).as("_t"))
      .select(col("id"), explode(concat(col("_t"), bigrams)).as("s"))
      .select(col("id"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          % buckets).as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("c"))
    assertSameRows(kernel, reference, "hashed_gram_hist")
  }

  test("gram_counts kernel == shingle rows grouped (n = 1, 2, 3)") {
    val d = docs()
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(1, 2, 3)) {
      val kernel = d
        .select(col("doc_id").as("id"),
          explode(call_function("gram_counts", col("text"), lit(n))).as("e"))
        .select(col("id"), col("e.s").as("s"), col("e.tf").as("tf"))
      val reference = Dedup.shingleRows(d, "doc_id", "text", n)
        .groupBy("id", "s").agg(count(lit(1)).as("tf"))
      assertSameRows(kernel, reference, s"gram_counts n=$n")
    }
  }

  test("winnow_pos kernel == struct-min argmin row form (ties -> lowest pos)") {
    graft.functions.GraftFunctions.register(spark)
    // low-entropy alphabet so identical k-grams recur WITHIN windows:
    // equal hashes force the tie-break path (argmin -> lowest pos),
    // which random text never exercises on 60-bit fingerprints
    val r = new scala.util.Random(7)
    val lowEntropy = (1 to 60).map { i =>
      val abc = "ab "
      (100L + i, (1 to (10 + r.nextInt(30)))
        .map(_ => abc(r.nextInt(abc.length))).mkString)
    }
    val d = (lowEntropy ++ Seq((200L, "aaaaaaaaaaaaaaaa"), (201L, "abababababab")))
      .toDF("doc_id", "text").filter(length(col("text")) > 0)
    val (k, w) = (4, 3)
    val kernel = d
      .select(col("doc_id").cast("long").as("id"),
        explode(call_function("winnow_pos", col("text"), lit(k), lit(w))).as("s"))
      .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
    // row form: per window start i (1..selEnd), the frame's min
    // (h, pos) struct — struct order = h first, then lowest pos,
    // exactly the kernel's strictly-less scan (and DuckDB's windowed
    // arg_min in frame order; see oracle notes) — then distinct pairs
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val reference = d
      .select(col("doc_id").cast("long").as("id"), col("text").as("t"))
      .select(col("id"), col("t"),
        posexplode(sequence(lit(1),
          greatest(length(col("t")) - (k - 1), lit(1)))).as(Seq("i", "pos")))
      .select(col("id"), col("pos"),
        conv(substring(md5(substring(col("t"), col("pos"), lit(k))), 1, 15),
          16, 10).cast("long").as("h"),
        (length(col("t")) - (k - 1)).as("np"))
      .withColumn("sel", min(struct(col("h"), col("pos"))).over(win))
      .filter(col("pos") <= greatest(col("np") - (w - 1), lit(1)))
      .select(col("id"), col("sel.pos").as("pos"), col("sel.h").as("fp"))
      .distinct()
    assertSameRows(kernel, reference, "winnow_pos argmin")
    // tie coverage is real, not incidental: some window must contain
    // two positions with the same hash (repeated gram)
    val tied = d
      .select(col("doc_id").cast("long").as("id"), col("text").as("t"))
      .select(col("id"),
        posexplode(sequence(lit(1),
          greatest(length(col("t")) - (k - 1), lit(1)))).as(Seq("i", "pos")),
        col("t"))
      .select(col("id"), col("pos"),
        substring(col("t"), col("pos"), lit(k)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(tied > 0, "fixture lost its repeated-gram tie coverage")
  }

  test("winnow_pos positions select real grams whose hash is the fingerprint") {
    graft.functions.GraftFunctions.register(spark)
    val d = docs().filter(length(col("text")) >= 1)
    val seeds = d
      .select(col("doc_id").as("id"), col("text").as("t"))
      .select(col("id"), col("t"),
        explode(call_function("winnow_pos", col("t"), lit(8), lit(4))).as("s"))
      .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"),
        conv(substring(md5(substring(col("t"), col("s.pos"), lit(8))), 1, 15),
          16, 10).cast("long").as("expected"))
    assert(seeds.filter(col("fp") =!= col("expected")).count() == 0)
    // and the fingerprint SET matches winnow_fps exactly
    val viaPos = seeds.select("id", "fp").distinct()
    val viaFps = Dedup.winnowFingerprints(d, "doc_id", "text", 8, 4)
    assertSameRows(viaPos, viaFps, "winnow_pos fp set")
  }

  test("ac_term_hits == brute-force per-position substring counting (overlaps, nesting, unicode)") {
    // brute force: every (start, term) with text.startsWith(term, i)
    // counts — the definition of "occurrence" the DuckDB oracle
    // replays with substr(text, i, len) = term
    def brute(text: String, terms: Seq[String]): Map[Int, Long] =
      terms.zipWithIndex.flatMap { case (t, ti) =>
        val c = (0 to text.length - t.length)
          .count(i => text.startsWith(t, i)).toLong
        if (c > 0) Some(ti -> c) else None
      }.toMap
    val terms = Seq("ab", "b", "aba", "一二", "😀", "c c", "αβ", "bab")
    val ac = new AhoCorasick(terms.toArray)
    val cases = Seq("", "a", "ababab", "bbb", "一二一二", "😀😀", "c c c",
      "αβαβ", "xbabax") ++ (1 to 80).map(randDoc)
    for (t <- cases) {
      val got = ac.termCounts(t).zipWithIndex
        .collect { case (c, i) if c > 0 => i -> c }.toMap
      assert(got == brute(t, terms), s"AC diverged on '$t'")
    }
    // overlap contract pinned explicitly: "aba" twice in "ababa",
    // "b" everywhere, "bab" once in "xbabax"
    assert(ac.termCounts("ababa").toSeq.take(3) == Seq(2L, 2L, 2L))
    assert(ac.termCounts("xbabax")(7) == 1L)
    // construction guards: empty lexicon, empty term, duplicate term
    assertThrows[IllegalArgumentException](new AhoCorasick(Array.empty))
    assertThrows[IllegalArgumentException](new AhoCorasick(Array("a", "")))
    assertThrows[IllegalArgumentException](new AhoCorasick(Array("a", "a")))
    // the registered expression agrees with the raw automaton and
    // codegen produces identical rows to interpreted eval
    graft.functions.GraftFunctions.register(spark)
    val d = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val viaExpr = d.select(col("doc_id"),
        explode(call_function("ac_term_hits", col("text"),
          typedLit(terms))).as("e"))
      .select(col("doc_id"), col("e.t"), col("e.c"))
    val viaBrute = cases.zipWithIndex.flatMap { case (txt, i) =>
      brute(txt, terms).toSeq.map { case (ti, c) => (i.toLong, ti, c) }
    }.toDF("doc_id", "t", "c")
    assertSameRows(viaExpr, viaBrute, "ac_term_hits rows")
  }

  test("vec_sqdist / vec_jl_project kernels == higher-order folds on random float and double vectors") {
    graft.functions.GraftFunctions.register(spark)
    val r = new scala.util.Random(7)
    // magnitudes spanning denormal-adjacent to large, plus negatives
    // and exact zeros — anything the fold and the loop could round
    // differently if the order ever diverged
    def rf(): Float = r.nextInt(5) match {
      case 0 => 0f
      case 1 => (r.nextFloat() - 0.5f) * 1e-6f
      case 2 => (r.nextFloat() - 0.5f) * 1e6f
      case _ => r.nextFloat() * 10f - 5f
    }
    val dims = Seq(1, 3, 16, 64, 65)
    for (n <- dims) {
      val vecsF = (0L until 40L).map(i => (i, Array.fill(n)(rf())))
        .toDF("id", "v")
      val vecsD = (0L until 40L).map(i =>
        (i, Array.fill(n)(rf().toDouble))).toDF("id", "v")
      for (vecs <- Seq(vecsF, vecsD)) {
        val pairs = vecs.as("a").crossJoin(vecs.limit(5).as("b"))
        val sq = pairs.select(
          aggregate(zip_with(col("a.v"), col("b.v"),
              (x, y) => (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))),
            lit(0.0), (acc, e) => acc + e).as("fold"),
          call_function("vec_sqdist", col("a.v"), col("b.v")).as("native"))
        assert(sq.filter(col("fold") =!= col("native")).count() == 0,
          s"vec_sqdist diverged at n=$n")
        val jl = vecs.select(
          transform(sequence(lit(0L), lit(7L)),
            j => graft.llm.Similarity.jlProjectFoldCol(col("v"), j)).as("fold"),
          call_function("vec_jl_project", col("v"), lit(8)).as("native"))
        assert(jl.filter(col("fold") =!= col("native")).count() == 0,
          s"vec_jl_project diverged at n=$n")
      }
    }
  }

  test("vec kernels fail loud on null elements and reject bad types at analysis") {
    graft.functions.GraftFunctions.register(spark)
    // null element: the replaced fold null-poisons; the raw-access
    // kernel would FABRICATE 0.0 from an UnsafeArrayData null slot —
    // it must throw instead (ADVICE r14)
    val withNull = Seq((0L, Array[java.lang.Double](1.0, null, 3.0)),
      (1L, Array[java.lang.Double](1.0, 2.0, 3.0))).toDF("id", "v")
    val ex = intercept[Exception] {
      withNull.as("a").crossJoin(withNull.limit(1).as("b"))
        .select(call_function("vec_sqdist", col("a.v"), col("b.v")))
        .collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && c.getCause != c) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(ex).contains("null element"), s"got: ${rootMsg(ex)}")
    // analysis-time type gate: array<int> used to pass analysis and
    // blow up mid-job with IllegalArgumentException from isFloat
    val ints = Seq((0L, Array(1, 2, 3))).toDF("id", "v")
    for (fn <- Seq("vec_sqdist", "vec_dot")) {
      val bad = intercept[org.apache.spark.sql.AnalysisException] {
        ints.as("a").crossJoin(ints.as("b"))
          .select(call_function(fn, col("a.v"), col("b.v")))
      }
      assert(bad.getMessage.contains("array<float|double>"), s"$fn: ${bad.getMessage}")
    }
    val badBucket = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(call_function("vec_lsh_bucket", col("v"), lit(4)))
    }
    assert(badBucket.getMessage.contains("array<float|double>"))
  }
}
