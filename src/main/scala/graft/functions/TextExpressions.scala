package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text-fingerprint kernels. The winnowing selection
  * (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm) is a
  * per-document computation — hash every char k-gram, keep each
  * w-window's minimum, dedup — with NO cross-row dependency, so the
  * natural Spark shape is one scalar expression per document, not a
  * per-position row explosion. The row form (posexplode → md5+conv
  * per position row → partitionBy(id) window min → distinct) was
  * measured at 3.4 s for a 1.45M-position corpus against a 1.8 s
  * floor for the generate alone — the per-position expression-eval
  * and row-materialization overhead dominates, not the hashing. This
  * kernel runs the whole document in one tight JVM loop inside
  * whole-stage codegen and eliminates the window shuffle entirely
  * (fingerprinting becomes embarrassingly row-parallel — the correct
  * 100 TB shape).
  *
  * Hash semantics are IDENTICAL to the expression form the DuckDB
  * oracles replay: fingerprint = first 60 bits of md5 of the UTF-8
  * bytes of the k-char substring, numerically equal to
  * `conv(substring(md5(g), 1, 15), 16, 10)` — 15 hex digits are the
  * top 60 bits of the big-endian digest prefix.
  */
object TextKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The MinHash modulus (see [[graft.llm.Dedup.MinhashP]] — defined
    * here so the kernel and the expression layer share one constant).
    * Small enough that (P−1)² fits a long, so the affine transforms
    * stay in exact integer arithmetic.
    */
  val MinhashP: Long = 2038074743L

  /** `conv(substring(md5(bytes), 1, 15), 16, 10)` as bit arithmetic:
    * the first 15 hex digits of the digest are its top 60 bits.
    */
  // PUBLIC (not private[functions]) on purpose: whole-stage codegen
  // calls this as a STATIC method from generated Java, and Scala only
  // emits the static forwarder for public object members — a
  // package-private member silently downgrades every Md5Prefix60 site
  // to interpreted eval (caught in the round-18 bench log as Janino
  // "method not declared" compile errors).
  def md5Prefix60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (dig(i) & 0xffL); i += 1 }
    l >>> 4
  }

  /** Start-byte offset of every char (index 0..nChars); only built
    * for non-ASCII strings — ASCII byte offsets ARE char offsets.
    */
  private def charOffsets(bytes: Array[Byte], nChars: Int): Array[Int] = {
    val offs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    offs
  }

  /** Distinct winnowing fingerprints of `t` (char k-grams, window w),
    * first-occurrence order. Exactly the selection of the SQL row
    * form over positions 1..max(nChars−k+1, 1) with the window
    * min over rows [pos, pos+w−1] kept for pos ≤ max(nChars−k−w+2, 1)
    * — including the short-document edges (a doc shorter than k
    * fingerprints its whole text; shorter than k+w−1 keeps its single
    * partial-window minimum).
    */
  /** 60-bit md5 prefix of every char k-gram start position
    * (1..max(nChars−k+1, 1); the last gram clamps for short docs) —
    * the shared hash pass of [[winnowFps]] and
    * [[WinnowPosKernel.winnowPos]].
    */
  private[functions] def gramHashes(bytes: Array[Byte], nChars: Int,
                                    k: Int): Array[Long] = {
    val offs = if (bytes.length == nChars) null else charOffsets(bytes, nChars)
    val nPos = math.max(nChars - (k - 1), 1)
    val hs = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      val endChar = math.min(p + k, nChars)
      val startB = if (offs == null) math.min(p, bytes.length) else offs(p)
      val endB = if (offs == null) endChar else offs(endChar)
      hs(p) = md5Prefix60(bytes, startB, endB - startB)
      p += 1
    }
    hs
  }

  /** Content-defined chunk rows of `t` — LBFS-style CDC
    * (Muthitacharoen, Chen & Mazières, SOSP 2001): a k-char window
    * slides over every position; wherever its hash ≡ 0 (mod d) the
    * text is cut after that window, so chunk boundaries anchor to
    * CONTENT (an insertion early in a document shifts bytes but the
    * downstream boundaries re-synchronize — the property fixed-size
    * blocks lack). Expected chunk length ≈ d chars. The window hash
    * and the emitted per-chunk fingerprint are both the 60-bit md5
    * prefix ([[md5Prefix60]]), so a SQL oracle replays boundaries
    * and chunk identities exactly. Windows slide CONTINUOUSLY
    * (straddling cuts), matching LBFS; production min/max chunk
    * clamps are deliberately omitted — they are tuning knobs that
    * would complicate the cross-engine replay without changing the
    * algorithmic shape.
    *
    * Returns (start 1-based char, len chars, h chunk fingerprint)
    * structs; a document shorter than k (no full window) is one
    * whole-text chunk; empty text → no chunks.
    */
  def cdcChunks(t: UTF8String, k: Int, d: Int): ArrayData = {
    val nChars = t.numChars()
    val bytes = t.getBytes
    if (nChars == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val offs = if (bytes.length == nChars) null else charOffsets(bytes, nChars)
    def bOff(c: Int): Int = if (offs == null) c else offs(c)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(startC: Int, endC: Int): Unit = {
      val sb = bOff(startC)
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](startC + 1, endC - startC,
          md5Prefix60(bytes, sb, bOff(endC) - sb)))
    }
    var chunkStart = 0
    var p = 0
    val lastGram = nChars - k // negative when the doc is shorter than k
    while (p <= lastGram) {
      if (md5Prefix60(bytes, bOff(p), bOff(p + k) - bOff(p)) % d == 0) {
        emit(chunkStart, p + k)
        chunkStart = p + k
      }
      p += 1
    }
    if (chunkStart < nChars) emit(chunkStart, nChars)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def winnowFps(t: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = t.numChars()
    val bytes = t.getBytes
    val hs = gramHashes(bytes, nChars, k)
    val nPos = hs.length
    val selEnd = math.max(nChars - k - w + 2, 1) // ≤ nPos by construction
    val seen = new java.util.HashSet[java.lang.Long](selEnd * 2)
    val out = new Array[Long](selEnd)
    var n = 0
    var i = 0
    while (i < selEnd) {
      var m = hs(i)
      var j = i + 1
      val end = math.min(i + w, nPos)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      if (seen.add(m)) { out(n) = m; n += 1 }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** Per-document DISTINCT window hashes for the substring-duplication
    * family (q94/q213 shape): k-char windows at char positions
    * 1, 1+stride, 1+2·stride, … ≤ max(nChars−k+1, 1), each hashed to
    * its 60-bit md5 prefix ([[md5Prefix60]]) and deduplicated
    * in first-occurrence order. Value-identical to the expression
    * pipeline it replaces —
    * `distinct(conv(substring(md5(substr(text, i, k)), 1, 15), 16, 10))`
    * over `sequence(1, greatest(length−k+1, 1), stride)` — including
    * the short-document clamp (a doc shorter than k hashes its whole
    * text once) and the empty-text edge (one hash of the empty
    * string), so the DuckDB oracle replay and any collision behavior
    * are unchanged. One codegen call per document replaces per-window
    * substr/md5-hex/conv string churn AND the corpus-window DISTINCT
    * exchange (the per-doc set is row-local).
    */
  def substrWindowHashes(t: UTF8String, k: Int, stride: Int): ArrayData = {
    val nChars = t.numChars()
    val bytes = t.getBytes
    val offs = if (bytes.length == nChars) null else charOffsets(bytes, nChars)
    val lastPos = math.max(nChars - (k - 1), 1) // count of 0-based starts
    val nW = (lastPos - 1) / stride + 1
    val seen = new java.util.HashSet[java.lang.Long](nW * 2)
    val out = new Array[Long](nW)
    var n = 0
    var p = 0
    while (p < lastPos) {
      val endChar = math.min(p + k, nChars)
      val startB = if (offs == null) math.min(p, bytes.length) else offs(p)
      val endB = if (offs == null) endChar else offs(endChar)
      val h = md5Prefix60(bytes, startB, endB - startB)
      if (seen.add(h)) { out(n) = h; n += 1 }
      p += stride
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, n))
  }
}

object WinnowPosKernel {

  /** [[TextKernels.winnowFps]] keeping POSITIONS: the distinct
    * (pos, fp) pairs where pos is the 1-based start of the k-gram
    * selected as its w-window's minimum (ties → lowest pos, the
    * strictly-less scan — same rule as DuckDB's windowed arg_min in
    * frame order). Content-anchored: two copies of a shared
    * substring select the same GRAMS, so `substring(t, pos, k)` is
    * identical across copies — the exact-verify handle the
    * fingerprint alone (60 bits, collision-able) cannot give.
    */
  def winnowPos(t: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = t.numChars()
    val bytes = t.getBytes
    val hs = TextKernels.gramHashes(bytes, nChars, k)
    val nPos = hs.length
    val selEnd = math.max(nChars - k - w + 2, 1)
    val seen = new java.util.HashSet[Integer](selEnd * 2)
    val out = new Array[org.apache.spark.sql.catalyst.InternalRow](selEnd)
    var n = 0
    var i = 0
    while (i < selEnd) {
      var mi = i
      var j = i + 1
      val end = math.min(i + w, nPos)
      while (j < end) { if (hs(j) < hs(mi)) mi = j; j += 1 }
      if (seen.add(mi)) {
        out(n) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](mi + 1, hs(mi)))
        n += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, n).asInstanceOf[Array[Any]])
  }
}

/** `winnow_pos(text, k, w)`: winnowing-selected (pos, fp) pairs —
  * see [[WinnowPosKernel.winnowPos]].
  */
case class WinnowPos(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {
  require(k > 0 && w > 0, s"winnow_pos: k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    WinnowPosKernel.winnowPos(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowPosKernel.winnowPos($t, $k, $w);")

  override def prettyName: String = "winnow_pos"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cdc_chunks(text, k, d)`: content-defined chunk (start, len, h)
  * structs — see [[TextKernels.cdcChunks]].
  */
case class CdcChunks(child: Expression, k: Int, d: Int)
    extends UnaryExpression with Serializable {
  require(k > 0 && d > 0, s"cdc_chunks: k and d must be positive, got k=$k d=$d")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("len",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.cdcChunks(t.asInstanceOf[UTF8String], k, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.cdcChunks($t, $k, $d);")

  override def prettyName: String = "cdc_chunks"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKernel {

  /** Java-regex `\s` without UNICODE_CHARACTER_CLASS — the exact
    * class Spark's `split(text, "\\s+")` matches. All five chars are
    * ASCII, and multi-byte UTF-8 sequences never contain bytes <
    * 0x80, so a byte scan tokenizes any UTF-8 text identically to
    * the regex split.
    */
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Word n-gram rows of `t`, one per position, exactly the
    * `posexplode(tokens) → concat_ws(" ", tok, lead…)` row form:
    * full windows for docs with ≥ n tokens (ntok − n + 1 shingles,
    * in order, duplicates preserved — consumers dedupe themselves),
    * one partial shingle of ALL tokens for shorter non-empty docs
    * (concat_ws skips the null leads), no rows for token-less docs.
    * n = 1 degenerates to the token list.
    */
  def shingles(t: UTF8String, n: Int): ArrayData = {
    val bytes = t.getBytes
    // token boundaries as byte slices
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < bytes.length) {
      if (!isSpace(bytes(i))) {
        val s = i
        while (i < bytes.length && !isSpace(bytes(i))) i += 1
        starts.add(s); ends.add(i)
      } else i += 1
    }
    val ntok = starts.size()
    if (ntok == 0) return ArrayData.toArrayData(Array.empty[UTF8String])
    def join(from: Int, until: Int): UTF8String = {
      var len = until - from - 1 // separators
      var j = from
      while (j < until) { len += ends.get(j) - starts.get(j); j += 1 }
      val out = new Array[Byte](len)
      var o = 0
      j = from
      while (j < until) {
        if (j > from) { out(o) = ' '; o += 1 }
        val tl = ends.get(j) - starts.get(j)
        System.arraycopy(bytes, starts.get(j), out, o, tl)
        o += tl
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    val nSh = math.max(ntok - n + 1, 1)
    val out = new Array[UTF8String](nSh)
    if (ntok < n) out(0) = join(0, ntok)
    else {
      var p = 0
      while (p < nSh) { out(p) = join(p, p + n); p += 1 }
    }
    ArrayData.toArrayData(out)
  }
}

/** `shingles(text, n)`: per-position word n-grams of a document as
  * one codegen call — see [[ShingleKernel.shingles]]. Replaces the
  * posexplode + lead-window row form (which paid an id-keyed window
  * sort per corpus and per-row expression eval per token); `explode`
  * of this array reproduces the same rows with no shuffle required
  * by the tokenization.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n > 0, s"shingles: n must be positive, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    ShingleKernel.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleKernel.shingles($t, $n);")

  override def prettyName: String = "shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashKernel {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Per-document MinHash signature + distinct shingle set in ONE
    * call: tokenize ([[ShingleKernel]] — identical to the SQL row
    * form), dedupe shingles (first-occurrence order; minima over the
    * distinct set equal minima over the multiset), one md5 per
    * DISTINCT shingle reduced mod p, then `numHashes` affine minima
    * (aₖ·x + bₖ) mod p with the same LCG coefficients as
    * [[graft.llm.Dedup.minhashAffineCol]] — bit-identical signatures,
    * no per-shingle row explosion, no aggregation exchange. Returns
    * null for token-less docs (the row form emits no rows for them).
    */
  def minhashSig(t: UTF8String, n: Int, numHashes: Int): Any = {
    val arr = ShingleKernel.shingles(t, n)
    val m = arr.numElements()
    if (m == 0) return null
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) { seen.add(arr.getUTF8String(i)); i += 1 }
    val p = TextKernels.MinhashP
    val nd = seen.size()
    val bases = new Array[Long](nd)
    val sh = new Array[UTF8String](nd)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) {
      val s = it.next()
      sh(j) = s
      val b = s.getBytes
      bases(j) = TextKernels.md5Prefix60(b, 0, b.length) % p
      j += 1
    }
    val mh = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val a = 1L + ((k * 2654435761L) % (p - 1))
      val bk = (k * 40503L + 17L) % p
      var mn = Long.MaxValue
      var x = 0
      while (x < nd) {
        val v = (a * bases(x) + bk) % p
        if (v < mn) mn = v
        x += 1
      }
      mh(k) = mn
      k += 1
    }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(sh), ArrayData.toArrayData(mh)))
  }
}

object HashedScoreKernel {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Weight table of the hashed-n-gram classifier: slot b weighs
    * `md5prefix60(b) % 2097153 − 1048576` (the same decimal-string
    * md5 the oracle's `range(0, buckets)` derivation replays).
    * Computed once per `buckets` value and shared across threads —
    * the in-kernel equivalent of the broadcast weight table.
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def weights(buckets: Int): Array[Long] =
    weightCache.computeIfAbsent(buckets, b => {
      val w = new Array[Long](b)
      var i = 0
      while (i < b) {
        val s = String.valueOf(i)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        w(i) = TextKernels.md5Prefix60(s, 0, s.length) % 2097153L - 1048576L
        i += 1
      }
      w
    })

  /** The hashed unigram+bigram bucket MULTISET of a document, in gram
    * order: every token's slot, then the space-joined bigrams' slots
    * for docs with ≥ 2 tokens or the single token's slot AGAIN for
    * 1-token docs (its degenerate "partial bigram") — exactly the
    * `uniBigramRows` + `gramBucketCol` row multiset (md5-prefix-60
    * mod buckets). Null (no rows) for token-less docs.
    */
  private[functions] def gramBuckets(t: UTF8String, buckets: Int): Array[Int] = {
    val toks = ShingleKernel.shingles(t, 1)
    val ntok = toks.numElements()
    if (ntok == 0) return null
    val out = new Array[Int](if (ntok >= 2) 2 * ntok - 1 else 2)
    var n = 0
    var i = 0
    while (i < ntok) {
      val b = toks.getUTF8String(i).getBytes
      out(n) = (TextKernels.md5Prefix60(b, 0, b.length) % buckets).toInt
      n += 1
      i += 1
    }
    if (ntok >= 2) {
      i = 0
      while (i < ntok - 1) {
        val a = toks.getUTF8String(i).getBytes
        val c = toks.getUTF8String(i + 1).getBytes
        val big = new Array[Byte](a.length + 1 + c.length)
        System.arraycopy(a, 0, big, 0, a.length)
        big(a.length) = ' '
        System.arraycopy(c, 0, big, a.length + 1, c.length)
        out(n) = (TextKernels.md5Prefix60(big, 0, big.length) % buckets).toInt
        n += 1
        i += 1
      }
    } else {
      out(n) = out(0)
      n += 1
    }
    out
  }

  /** Per-document hashed unigram+bigram classifier score in one pass
    * over [[gramBuckets]]: struct(n_grams, sum of slot weights) —
    * exact integers, so the downstream mean/keep projections are
    * bit-identical to the aggregated row form. Null for token-less
    * docs (the row form emits no rows).
    */
  def hashedScore(t: UTF8String, buckets: Int): Any = {
    val bs = gramBuckets(t, buckets)
    if (bs == null) return null
    val w = weights(buckets)
    var sum = 0L
    var i = 0
    while (i < bs.length) { sum += w(bs(i)); i += 1 }
    new GenericInternalRow(Array[Any](bs.length.toLong, sum))
  }

  /** Per-document hashed-gram bucket HISTOGRAM: the [[gramBuckets]]
    * multiset collapsed to (bucket, count) pairs, buckets ascending —
    * the per-doc sufficient statistic of every hashed-bag model
    * (DSIR's multinomials fit from the exploded histograms; per-doc
    * scoring is then an array fold against a broadcast weight table,
    * no corpus-gram-volume shuffle anywhere). Null for token-less
    * docs.
    */
  def gramHist(t: UTF8String, buckets: Int): ArrayData = {
    val bs = gramBuckets(t, buckets)
    if (bs == null) return null
    java.util.Arrays.sort(bs)
    var distinct = 1
    var i = 1
    while (i < bs.length) { if (bs(i) != bs(i - 1)) distinct += 1; i += 1 }
    val rows = new Array[Any](distinct)
    var o = 0
    i = 0
    while (i < bs.length) {
      var j = i
      while (j < bs.length && bs(j) == bs(i)) j += 1
      rows(o) = new GenericInternalRow(Array[Any](bs(i), (j - i).toLong))
      o += 1
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** `hashed_gram_hist(text, buckets)`: a document's hashed
  * unigram+bigram bucket histogram as one codegen call — see
  * [[HashedScoreKernel.gramHist]].
  */
case class HashedGramHist(child: Expression, buckets: Int)
    extends UnaryExpression with Serializable {
  require(buckets > 0, s"hashed_gram_hist: buckets must be positive, got $buckets")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("c", LongType, nullable = false))),
    containsNull = false)

  // token-less docs yield null (mirrors the row form emitting no rows)
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    HashedScoreKernel.gramHist(t.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      Object r = graft.functions.HashedScoreKernel.gramHist($t, $buckets);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)

  override def prettyName: String = "hashed_gram_hist"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramCountKernel {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Per-document term-frequency table in one pass: the
    * [[ShingleKernel.shingles]] multiset (full windows, one partial
    * shingle for short non-empty docs) collapsed to distinct
    * (gram, count) pairs in first-occurrence order — the per-doc
    * sufficient statistic of every tf consumer (inverted indexes,
    * entropy, repetition signals). Exploding the result reproduces
    * the `shingleRows → groupBy(id, s) count` rows with NO
    * aggregation exchange: the corpus-gram-volume shuffle becomes a
    * per-doc hash map. Null for token-less docs (the row form emits
    * no rows).
    */
  def gramCounts(t: UTF8String, n: Int): Any = {
    val arr = ShingleKernel.shingles(t, n)
    val m = arr.numElements()
    if (m == 0) return null
    val counts = new java.util.LinkedHashMap[UTF8String, Long](m * 2)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      val c = counts.get(s)
      counts.put(s, if (c == null) 1L else c + 1L)
      i += 1
    }
    val rows = new Array[Any](counts.size())
    var o = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      rows(o) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** `gram_counts(text, n)`: a document's distinct word n-grams with
  * their multiplicities as one codegen call — see
  * [[GramCountKernel.gramCounts]].
  */
case class GramCounts(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n > 0, s"gram_counts: n must be positive, got $n")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)

  // token-less docs yield null (mirrors the row form emitting no rows)
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    GramCountKernel.gramCounts(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      Object r = graft.functions.GramCountKernel.gramCounts($t, $n);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)

  override def prettyName: String = "gram_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hashed_ngram_score(text, buckets)`: a document's hashed-n-gram
  * classifier gram count and fixed-point weight sum as one codegen
  * call — see [[HashedScoreKernel.hashedScore]]. Turns the
  * fastText-style scorer (Joulin et al. 2016) from explode + weight
  * join + doc-keyed aggregation into a map-only corpus scan.
  */
case class HashedNgramScore(child: Expression, buckets: Int)
    extends UnaryExpression with Serializable {
  require(buckets > 0, s"hashed_ngram_score: buckets must be positive, got $buckets")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_grams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_fp", LongType, nullable = false)))

  // token-less docs yield null (mirrors the row form emitting no rows)
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    HashedScoreKernel.hashedScore(t.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      Object r = graft.functions.HashedScoreKernel.hashedScore($t, $buckets);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
    """)

  override def prettyName: String = "hashed_ngram_score"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(text, shingleLen, numHashes)`: a document's distinct
  * word-shingle set and MinHash signature as one codegen call — see
  * [[MinhashKernel.minhashSig]].
  */
case class MinhashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with Serializable {
  require(n > 0 && numHashes > 0,
    s"minhash_sig: n and numHashes must be positive, got n=$n numHashes=$numHashes")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sh",
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("mh",
      ArrayType(LongType, containsNull = false), nullable = false)))

  // token-less docs yield null (mirrors the row form emitting no rows)
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    MinhashKernel.minhashSig(t.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      Object r = graft.functions.MinhashKernel.minhashSig($t, $n, $numHashes);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
    """)

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fps(text, k, w)`: the distinct winnowing fingerprint set
  * of a document as one codegen call — see [[TextKernels.winnowFps]].
  * k and w must be integer literals (they shape the kernel, not the
  * data). Null text yields null (no fingerprints), matching SQL
  * null propagation.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {
  require(k > 0 && w > 0, s"winnow_fps: k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.winnowFps(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.winnowFps($t, $k, $w);")

  override def prettyName: String = "winnow_fps"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_prefix60(s)`: the top 60 bits of md5(s) as a BIGINT —
  * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (see
  * [[TextKernels.md5Prefix60]]; the 15 leading hex digits ARE the top
  * 60 bits of the big-endian digest prefix) but computed straight
  * from the digest bytes, skipping the hex-string materialization and
  * the string-parsing `conv`. The expression-form equality is what
  * every DuckDB oracle replays, so swapping call sites is
  * value-neutral by construction.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(t: Any): Any = {
    val b = t.asInstanceOf[UTF8String].getBytes
    TextKernels.md5Prefix60(b, 0, b.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      byte[] md5p60b = $t.getBytes();
      ${ev.value} = graft.functions.TextKernels.md5Prefix60(md5p60b, 0, md5p60b.length);
    """)

  override def prettyName: String = "md5_prefix60"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `substr_window_hashes(text, k, stride)`: a document's distinct
  * k-char-window hash set at the given stride — see
  * [[TextKernels.substrWindowHashes]]. Turns the substring-dup
  * window build (sequence + substr + md5-hex + conv + corpus-wide
  * DISTINCT) into one map-only codegen call per document.
  */
case class SubstrWindowHashes(child: Expression, k: Int, stride: Int)
    extends UnaryExpression with Serializable {
  require(k > 0 && stride > 0,
    s"substr_window_hashes: k and stride must be positive, got k=$k stride=$stride")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.substrWindowHashes(t.asInstanceOf[UTF8String], k, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.substrWindowHashes($t, $k, $stride);")

  override def prettyName: String = "substr_window_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeKernel {

  /** One BPE merge round over a document's symbol sequence: greedy
    * leftmost non-overlapping replacement of adjacent (l, r) pairs by
    * the merged symbol `l + " " + r`. Raw whitespace-split tokens
    * never contain spaces, so the space-joined merged symbol is an
    * unambiguous new alphabet member (and itself mergeable in later
    * rounds — standard BPE). A symbol merged in THIS round is never
    * the left side of another merge in the same round (the merged
    * symbol is strictly longer than `l`), which makes this linear
    * scan equivalent to the sequential fold an engine without the
    * kernel replays (`list_reduce` in the oracle): "a a a" under
    * (a, a) merges the first two and leaves the third.
    */
  def bpeMerge(a: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = a.numElements()
    val merged = UTF8String.concat(l, UTF8String.fromString(" "), r)
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      val cur = a.getUTF8String(i)
      if (i + 1 < n && cur.equals(l) && a.getUTF8String(i + 1).equals(r)) {
        out(k) = merged; k += 1; i += 2
      } else { out(k) = cur; k += 1; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k).asInstanceOf[Array[Any]])
  }
}

/** `bpe_merge(symbols, l, r)`: one greedy BPE merge round — see
  * [[BpeMergeKernel.bpeMerge]]. `l`/`r` are string literals (the
  * round's chosen pair shapes the kernel, not the data).
  */
case class BpeMerge(child: Expression, l: String, r: String)
    extends UnaryExpression with Serializable {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  private lazy val lU = UTF8String.fromString(l)
  private lazy val rU = UTF8String.fromString(r)

  override protected def nullSafeEval(a: Any): Any =
    BpeMergeKernel.bpeMerge(a.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", rU, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeMergeKernel.bpeMerge($a, $lRef, $rRef);")
  }

  override def prettyName: String = "bpe_merge"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): ONE
  * left-to-right pass over a document counts every occurrence of
  * every lexicon term — including overlaps and nested terms
  * ("scan" inside "scan slow" both count) — where the naive shape is
  * K separate `instr`/regexp scans of the same text. At 100 TB a
  * K-term lexicon (bad-words lists run to hundreds of entries) makes
  * that a K× scan-cost multiplier; the automaton makes lexicon size
  * free at match time (goto/fail transitions are O(1) amortized per
  * char). Matching is SUBSTRING semantics on exact chars — callers
  * wanting word boundaries pad terms with spaces, wanting case
  * folding lower() both sides (see `TextAnalysis.lexiconTag`).
  *
  * Occurrence counts are indexing-unit independent (the automaton
  * walks UTF-16 units, a SQL oracle walks code points): a match is a
  * byte-aligned substring occurrence either way — a term cannot
  * begin mid-surrogate because high/low surrogate ranges are
  * disjoint — so `substr`-position replays agree exactly.
  *
  * Serializable plain-array form (goto maps, fail links, flattened
  * output lists) so one built automaton ships to executors inside
  * the codegen references array instead of rebuilding per task.
  */
final class AhoCorasick(terms: Array[String]) extends Serializable {
  require(terms.nonEmpty, "lexicon must be non-empty")
  require(terms.forall(_.nonEmpty), "lexicon terms must be non-empty strings")
  require(terms.distinct.length == terms.length,
    "lexicon terms must be distinct (duplicate entries would double-count)")

  val nTerms: Int = terms.length

  // trie build (growable), then frozen to arrays
  private val gotoMaps = {
    val children = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    val ends = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    children.add(new java.util.HashMap()); ends.add(new java.util.ArrayList())
    var ti = 0
    while (ti < terms.length) {
      var s = 0
      val t = terms(ti)
      var i = 0
      while (i < t.length) {
        val m = children.get(s)
        var nx = m.get(t.charAt(i))
        if (nx == null) {
          children.add(new java.util.HashMap())
          ends.add(new java.util.ArrayList())
          nx = children.size() - 1
          m.put(t.charAt(i), nx)
        }
        s = nx
        i += 1
      }
      ends.get(s).add(ti)
      ti += 1
    }
    (children, ends)
  }
  private val children = gotoMaps._1
  private val nNodes = children.size()
  // BFS fail links + flattened outputs (out(s) = ends(s) ++ out(fail(s)))
  private val fail = new Array[Int](nNodes)
  private val out: Array[Array[Int]] = {
    val ends = gotoMaps._2
    val o = new Array[Array[Int]](nNodes)
    o(0) = ends.get(0).toArray(new Array[Integer](0)).map(_.intValue)
    val q = new java.util.ArrayDeque[Integer]()
    children.get(0).forEach { (_, c) =>
      fail(c) = 0
      o(c) = (ends.get(c).toArray(new Array[Integer](0)).map(_.intValue)
        ++ o(0))
      q.add(c)
    }
    while (!q.isEmpty) {
      val u = q.poll()
      children.get(u).forEach { (ch, v) =>
        // walk fail chain for the child's fail state
        var f = fail(u)
        var hop = children.get(f).get(ch)
        while (hop == null && f != 0) { f = fail(f); hop = children.get(f).get(ch) }
        fail(v) = if (hop == null || hop == v) 0 else hop.intValue
        o(v) = (ends.get(v).toArray(new Array[Integer](0)).map(_.intValue)
          ++ o(fail(v)))
        q.add(v)
      }
    }
    o
  }

  private def step(state: Int, ch: Char): Int = {
    var s = state
    var nx = children.get(s).get(ch)
    while (nx == null && s != 0) { s = fail(s); nx = children.get(s).get(ch) }
    if (nx == null) 0 else nx.intValue
  }

  /** Per-term occurrence counts over one document (counts every match
    * end position; overlaps and nested terms all count).
    */
  def termCounts(text: String): Array[Long] = {
    val counts = new Array[Long](nTerms)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      val hits = out(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }

  /** The codegen entry: (t INT, c BIGINT) rows for terms with c > 0,
    * ascending term index; empty array (never null) for no-hit docs.
    */
  def termHitRows(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val counts = termCounts(text.toString)
    var nz = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > 0) nz += 1; i += 1 }
    val rows = new Array[Any](nz)
    var o = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0) {
        rows(o) = new GenericInternalRow(Array[Any](i, counts(i)))
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** `ac_term_hits(text, array('t0','t1',…))`: per-term occurrence
  * counts of a constant lexicon in one Aho–Corasick pass — see
  * [[AhoCorasick]]. The lexicon is a literal (it shapes the automaton
  * baked into the plan, not the data); rows are (t, c) with t the
  * 0-based index into the lexicon array, only hit terms present.
  */
case class AcTermHits(child: Expression, terms: Seq[String])
    extends UnaryExpression with Serializable {

  // plain val: lexicon validation fails at plan time on the driver,
  // and the one built automaton ships (Serializable) to executors
  private val ac = new AhoCorasick(terms.toArray)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("c", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    ac.termHitRows(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAuto", ac, "graft.functions.AhoCorasick")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $acRef.termHitRows($t);")
  }

  override def prettyName: String = "ac_term_hits"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
