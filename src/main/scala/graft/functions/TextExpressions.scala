package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text near-dup pipeline. Both take an
  * `array<bigint>` of per-feature hashes (producer: `transform(...,
  * xxhash64)` in the scan stage) and run tight generated loops — the
  * higher-order-function formulations evaluate an interpreted lambda
  * per (element × pass) and measured 10-30× slower at sf0.1
  * (PLAN_NOTES.md).
  */

/** 64-bit SimHash of a feature-hash array: bit i of the result is set
  * iff the ±1 votes of bit i across all feature hashes sum ≥ 0.
  * Bit-for-bit the semantics of the HOF formulation it replaces
  * (pinned in DedupSpec). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireLongArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < xs.numElements()) {
      val h = xs.getLong(j)
      var i = 0
      while (i < 64) {
        votes(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) >= 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((int)(($h >>> $i) & 1L) << 1) - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] >= 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (MOSS) over a token array: per-token
  * polynomial hash, k-gram hashes by polynomial rolling combination of
  * `k` consecutive token hashes, then the distinct minima
  * (first-occurrence order) of every sliding window of `w` k-gram
  * hashes. Output `array<bigint>`.
  *
  * All arithmetic is shift-polynomials modulo the Mersenne prime
  * 2^61-1 (token chars: base 2^5; k-grams: base 2^13) — chosen so an
  * independent engine can reproduce the fingerprints exactly with
  * plain 128-bit modular arithmetic (`(acc * base + x) % (2^61-1)`);
  * that is what the DuckDB oracles for `text_fingerprints` /
  * `text_fingerprint_pairs` do. Characters enter as Unicode code
  * points (= DuckDB `unicode()` per char, surrogate-correct). */
case class WinnowTokenFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any = {
    import TextExpressions.fold61
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val nk = n - k + 1
    if (nk < w) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = xs.getUTF8String(i)
      // a null element hashes like the empty token (0) instead of NPE
      val s = if (u == null) "" else u.toString
      var h = 0L
      var p = 0
      while (p < s.length) {
        val cp = s.codePointAt(p)
        h = fold61(h, 5, cp.toLong)
        p += Character.charCount(cp)
      }
      th(i) = h
      i += 1
    }
    val kh = new Array[Long](nk)
    i = 0
    while (i < nk) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = fold61(acc, 13, th(i + j)); j += 1 }
      kh(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nk - w) {
      var min = kh(i)
      var j = 1
      while (j < w) { if (kh(i + j) < min) min = kh(i + j); j += 1 }
      seen.add(min)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  // CodegenFallback-style: array-building loops with hash-set state
  // gain little from inline codegen; the interpreted path above is
  // already tight JVM loops (no per-element lambda dispatch).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("winnowExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL k-gram rolling span hashes of a token array, in position order
  * (element i = hash of tokens [i, i+k)) — the winnowing kernel's
  * k-gram stage WITHOUT the window-minimum selection, for span-level
  * exact-duplicate detection (Lee et al. 2021 "Deduplicating Training
  * Data" family): every k-token span is a posting, spans recurring
  * across documents mark duplicated passages. Same hash chain as
  * [[WinnowTokenFingerprints]] (token fold base 5, k-gram fold base
  * 13, Mersenne-61), so the DuckDB oracle reuses the proven HUGEINT
  * recipe verbatim. Returns an empty array for docs shorter than k. */
case class KgramSpanHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_span_hashes"

  override def nullSafeEval(a: Any): Any = {
    import TextExpressions.fold61
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val nk = n - k + 1
    if (nk <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = xs.getUTF8String(i)
      val s = if (u == null) "" else u.toString
      var h = 0L
      var p = 0
      while (p < s.length) {
        val cp = s.codePointAt(p)
        h = fold61(h, 5, cp.toLong)
        p += Character.charCount(cp)
      }
      th(i) = h
      i += 1
    }
    val kh = new Array[Long](nk)
    i = 0
    while (i < nk) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = fold61(acc, 13, th(i + j)); j += 1 }
      kh(i) = acc
      i += 1
    }
    new GenericArrayData(kh)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("kgramExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk boundaries + per-chunk hashes of a raw text
  * column — the Gear/FastCDC rolling-hash family (Xia et al., FAST'16)
  * at codepoint granularity, for chunk-level storage-style dedup of
  * shift-edited documents: an insertion early in a document shifts
  * every fixed-window span but leaves all DOWNSTREAM chunk boundaries
  * (re-synchronized by content) and therefore their hashes intact —
  * the failure mode fixed-k span dedup pays a full re-scan for.
  *
  * Per codepoint c: `h = (h << 1) + fmix64(c)` (a 64-bit Gear shift
  * register — contributions older than 64 positions shift out of the
  * word, so h is implicitly a 64-char sliding window; the fmix64 gear
  * "table" breaks the linearity a raw codepoint sum would have, the
  * same lesson as [[M61TokenHashes]]). A boundary falls after c when
  * the chunk reaches `minLen` and the low `maskBits` bits of h are
  * zero (expected chunk ≈ 2^maskBits), or unconditionally at `maxLen`
  * (FastCDC's min/max clamps). Each chunk emits
  * `struct(h = fmix64(M61 base-32 fold of its codepoints), len)` —
  * the exact scalar-hash chain of [[graft.OracleSql.m61FmixScalarCtes]],
  * so the DuckDB oracle reproduces chunk hashes verbatim and hash
  * collisions cannot diverge the two engines. The final partial chunk
  * is emitted; boundaries never reset h (pure function of the char
  * stream — what makes the oracle's per-position window fold exact).
  *
  * Returns an empty array for the empty string; codepoints stand in
  * for UTF-8 bytes (exact for the ASCII testdata payloads — the
  * established Multimodal/scrub convention). */
case class CdcChunkHashes(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 62, s"maskBits must be in [1, 62], got $maskBits")
  require(minLen >= 1 && maxLen > minLen, s"need 1 <= minLen < maxLen, got [$minLen, $maxLen]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("len", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(a: Any): Any = {
    import TextExpressions.{fmix64, fold61}
    val s = a.asInstanceOf[UTF8String].toString
    val cps = new Array[Int](s.length)
    var ncp = 0
    var p = 0
    while (p < s.length) {
      val cp = s.codePointAt(p)
      cps(ncp) = cp
      ncp += 1
      p += Character.charCount(cp)
    }
    if (ncp == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(start: Int, len: Int): Unit = {
      var hh = 0L
      var j = 0
      while (j < len) { hh = fold61(hh, 5, cps(start + j).toLong); j += 1 }
      out += new GenericInternalRow(Array[Any](fmix64(hh), len.toLong))
    }
    var h = 0L
    var start = 0
    var i = 0
    while (i < ncp) {
      h = (h << 1) + fmix64(cps(i).toLong)
      val clen = i + 1 - start
      if ((clen >= minLen && (h & mask) == 0L) || clen >= maxLen) {
        emit(start, clen)
        start = i + 1
      }
      i += 1
    }
    if (start < ncp) emit(start, ncp - start)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("cdcExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-element hash of an `array<string>`: the Mersenne-61
  * shift-polynomial fold of each element's Unicode code points (the
  * same token hash [[WinnowTokenFingerprints]] computes internally),
  * finished with MurmurHash3's fmix64 avalanche. Both stages are
  * reproducible by an independent engine with plain 128-bit modular
  * arithmetic — that is what makes `dedup_simhash_pairs` fully
  * oracle-checkable in DuckDB, where xxhash64 (the previous feature
  * hash) is not available.
  *
  * The finalizer is NOT optional for SimHash-style bit-vote
  * consumers: a bare polynomial hash is linear, so shingles sharing a
  * prefix differ by a CONSTANT arithmetic delta (poly("X Y a") −
  * poly("X Y b") is the same for every prefix "X Y"), which
  * correlates vote bits corpus-wide — measured 18× false-near-pair
  * inflation on the 31-word-vocabulary testdata vs xxhash64. fmix64's
  * xor-shift/multiply rounds break the linearity; its mod-2^64
  * multiplies map exactly to DuckDB HUGEINT split-multiplication. */
case class M61TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "m61_token_hashes"

  override def nullSafeEval(a: Any): Any = {
    import TextExpressions.fold61
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = xs.getUTF8String(i)
      // a null element hashes like the empty token (0) — same rule as
      // the winnow kernel
      val s = if (u == null) "" else u.toString
      var h = 0L
      var p = 0
      while (p < s.length) {
        val cp = s.codePointAt(p)
        h = fold61(h, 5, cp.toLong)
        p += Character.charCount(cp)
      }
      out(i) = TextExpressions.fmix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("m61Expr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array, space-joined, in
  * first-occurrence order — semantically identical to
  * `array_distinct(transform(sequence(0, size(t) - n), i ->
  * concat_ws(' ', slice(t, i + 1, n))))` but one tight loop instead of
  * an interpreted lambda per (element × pass): the HOF formulation
  * measured ~5 s per lineage pass at sf0.1 on a single input split
  * vs < 0.3 s for this kernel (the Jaccard family re-derives the
  * shingling lineage up to three times per query).
  *
  * NULL tokens join as empty strings (concat_ws semantics: `split`
  * never produces NULL elements, so this is unreachable on the
  * production input but defined for safety). */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val m = xs.numElements()
    val out = m - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val u = xs.getUTF8String(i)
      toks(i) = if (u == null) "" else u.toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < out) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("ngramExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass MinHash signature over an `array<string>` of shingles:
  * each shingle hashes to x = fmix64(M61-fold(chars)) mod P (the same
  * DuckDB-reproducible family as [[M61TokenHashes]], reduced into
  * [0, P) with P = 2^31-1), and signature slot i is
  * min over shingles of (a_i·x + b_i) mod P for the caller's fixed
  * coefficient family. Replaces a 64-pass `array_min(transform(...))`
  * HOF stack (one interpreted lambda per element × 64 passes) with a
  * single loop doing 64 multiplies per element.
  *
  * ANSI-safety: a_i < 2^31 and x < 2^31 keep a·x + b < 2^62.
  * Returns NULL for an empty shingle array (min over nothing — the
  * HOF formulation yielded NULL slots; callers filter docs with < n
  * tokens, so neither arises on production input). */
case class MinHashSig(child: Expression, coeffs: Seq[(Long, Long)], p: Long)
    extends UnaryExpression {
  require(coeffs.nonEmpty, "need at least one hash coefficient pair")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  override def nullSafeEval(a: Any): Any = {
    import TextExpressions.{fold61, fmix64}
    val xs = a.asInstanceOf[ArrayData]
    val m = xs.numElements()
    if (m == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val u = xs.getUTF8String(j)
      val s = if (u == null) "" else u.toString
      var h = 0L
      var q = 0
      while (q < s.length) {
        val cp = s.codePointAt(q)
        h = fold61(h, 5, cp.toLong)
        q += Character.charCount(cp)
      }
      val x = java.lang.Math.floorMod(fmix64(h), p)
      var i = 0
      while (i < k) {
        val v = (as(i) * x + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("minhashExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |Object r = $expr.nullSafeEval($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Mersenne prime 2^61 - 1: the fingerprint hash modulus. */
  val M61: Long = (1L << 61) - 1

  /** `(acc * 2^shift + x) mod (2^61-1)` without overflow: since
    * 2^61 ≡ 1 (mod M61), the product's high bits fold back additively.
    * Preconditions: 0 ≤ acc < 2^61, 0 ≤ x < 2^61, 1 ≤ shift ≤ 61. */
  @inline def fold61(acc: Long, shift: Int, x: Long): Long = {
    var r = ((acc << shift) & M61) + (acc >>> (61 - shift)) + x
    while (r >= M61) r -= M61
    r
  }

  /** MurmurHash3's 64-bit finalizer: xor-shift + wrapping-multiply
    * avalanche. Java's wrapping `*` IS multiplication mod 2^64, which
    * DuckDB reproduces on non-negative HUGEINTs via split
    * multiplication (hi/lo 32-bit halves) — see `Dedup.simhashPairsSql`. */
  @inline def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def requireLongArray(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<bigint> input, got ${other.simpleString}")
  }
}

object textFunctions {
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
  def winnow_fingerprints(tokens: Column, k: Int = 5, w: Int = 4): Column =
    ColumnBridge.column(WinnowTokenFingerprints(ColumnBridge.expression(tokens), k, w))
  def m61_token_hashes(tokens: Column): Column =
    ColumnBridge.column(M61TokenHashes(ColumnBridge.expression(tokens)))
  def word_ngrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n))
  /** Scalar M61+fmix64 hash of a column's string form, masked to
    * [0, 2^63) so signed ordering == unsigned ordering — the
    * DuckDB-reproducible deterministic hash used by KMV sketching and
    * seed selection (oracle recipe: [[graft.OracleSql.m61FmixScalarCtes]]). */
  def m61_fmix_hash63(c: Column): Column = {
    import org.apache.spark.sql.functions._
    element_at(m61_token_hashes(array(c.cast("string"))), 1)
      .bitwiseAND(lit(Long.MaxValue))
  }
  def minhash_sig(shingles: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), coeffs, p))
  def kgram_span_hashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(KgramSpanHashes(ColumnBridge.expression(tokens), k))
  def cdc_chunk_hashes(text: Column, maskBits: Int, minLen: Int, maxLen: Int): Column =
    ColumnBridge.column(CdcChunkHashes(ColumnBridge.expression(text), maskBits, minLen, maxLen))
}
