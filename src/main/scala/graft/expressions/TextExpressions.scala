package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels (same rationale as [[Kernels]]: one JVM loop per
  * row inside whole-stage codegen instead of per-element interpreted
  * lambdas from `transform`/`sequence`/`slice` compositions). */
object TextKernels {

  /** All word n-grams of a token array, space-joined, in order
    * (non-distinct — counting semantics; wrap with array_distinct for set
    * semantics). Arrays shorter than n yield one gram of all tokens,
    * matching the column formulation used by Dedup.shingles. */
  def ngrams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - n + 1, if (len > 0) 1 else 0)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      val hi = math.min(i + n, len)
      var k = i
      while (k < hi) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(k)) sb.append(tokens.getUTF8String(k).toString)
        j += 1
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- engine-portable polynomial hash family ------------------------------
  // H(s) = fold over Unicode codepoints of (h·131 + cp) mod (2^31−1);
  // family member j: G_j(H) = ((2j+1)·H + j·1013904223) mod (2^31−1).
  // Plain integer arithmetic DuckDB reproduces with list_reduce /
  // list_transform — which is what puts minhash/simhash dedup on the
  // oracle (xxhash64 has no cross-engine equivalent). Max intermediate
  // < 2^39: overflow-free in long arithmetic on both engines.

  final val PolyP: Long = 2147483647L // 2^31 − 1
  final val PolyHalf: Long = 1073741823L // P integer-div 2

  /** Portable polynomial string hash over Unicode codepoints. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131 + cp) % PolyP
      i += Character.charCount(cp)
    }
    h
  }

  /** MinHash signature over the PORTABLE hash family: sig_j = min over
    * shingles of G_j(H(shingle)); empty input yields Long.MaxValue
    * sentinels (callers exclude empty shingle sets). */
  def minhashPoly(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = polyHash(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val g = ((2L * j + 1L) * h + j * 1013904223L) % PolyP
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box: Long => java.lang.Long).asInstanceOf[Array[AnyRef]])
  }

  /** 62-bit SimHash over the portable family: bit j set when the count of
    * tokens with G_j(H) ≥ P/2 exceeds the count below (votes +1/−1). */
  def simhashPoly(tokens: ArrayData): Long = {
    val votes = new Array[Int](62)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = polyHash(tokens.getUTF8String(i))
        var j = 0
        while (j < 62) {
          val g = ((2L * j + 1L) * h + j * 1013904223L) % PolyP
          if (g >= PolyHalf) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 62) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Winnowing fingerprints (the MOSS local-sampling scheme, Schleimer–
    * Wilkerson–Aiken SIGMOD'03): k-gram rolling hashes over the codepoint
    * stream, then the DISTINCT set of minima over every window of w
    * consecutive hashes. The guarantee: any substring of length ≥ w+k−1
    * shared by two texts contributes at least one shared fingerprint
    * VALUE — which is what makes exact-substring dedup sub-quadratic (a
    * bounded sample per doc instead of every k-gram). Hashes are the
    * portable polynomial (H over codepoints mod 2^31−1), so DuckDB
    * reproduces the exact fingerprint sets. Texts shorter than k yield
    * the whole-text hash; empty text yields the empty set. One O(n) JVM
    * pass: rolling-hash recurrence + monotonic-deque sliding minimum. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val str = text.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val cps = new Array[Int](n)
    var i = 0
    var ci = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(ci) = cp
      ci += 1
      i += Character.charCount(cp)
    }
    val m = if (n < k) 1 else n - k + 1
    val hs = new Array[Long](m)
    if (n < k) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * 131 + cps(j)) % PolyP; j += 1 }
      hs(0) = h
    } else {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 131 + cps(j)) % PolyP; j += 1 }
      hs(0) = h
      var pow = 1L // 131^(k-1) mod P
      j = 0
      while (j < k - 1) { pow = (pow * 131) % PolyP; j += 1 }
      var p = 1
      while (p < m) {
        // drop cps(p-1), shift, append cps(p+k-1); all mod P, kept >= 0
        h = ((h - (cps(p - 1) * pow) % PolyP + PolyP) * 131 + cps(p + k - 1)) % PolyP
        hs(p) = h
        p += 1
      }
    }
    val ww = math.min(w, m)
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](m) // monotonic min-deque of indices, [head, tail)
    var head = 0
    var tail = 0
    var q = 0
    while (q < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(q)) tail -= 1
      deque(tail) = q
      tail += 1
      if (deque(head) <= q - ww) head += 1
      if (q >= ww - 1) set.add(hs(deque(head)))
      q += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var oi = 0
    while (it.hasNext) { out(oi) = it.next(); oi += 1 }
    new GenericArrayData(out)
  }

  /** Bloom-filter probe: count of grams whose TWO filter bits are both set
    * in the `words` bit table (m = 64·|words| bits; bit positions are the
    * portable polynomial hashes with bases 131 and 137, mod m — the exact
    * formulation [[graft.functions.Curation.decontaminateBloom]] builds
    * the filter with, so build and probe agree bit-for-bit). One JVM loop
    * computing both hashes in a single pass over each gram's codepoints:
    * the `aggregate()` HOF formulation this replaces re-evaluated two
    * interpreted polyHash lambdas per gram per document outside codegen
    * and measured ~4× slower than the exact sweep it exists to undercut. */
  def bloomHits(grams: ArrayData, words: ArrayData): Long = {
    val m = words.numElements().toLong * 64L
    var hits = 0L
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val str = grams.getUTF8String(i).toString
        var h1 = 0L
        var h2 = 0L
        var j = 0
        // per UTF-16 code unit, matching the build side's split("")+ascii
        // column formulation exactly (== codepoints on BMP text)
        while (j < str.length) {
          val cp = str.charAt(j).toLong
          h1 = (h1 * 131 + cp) % PolyP
          h2 = (h2 * 137 + cp) % PolyP
          j += 1
        }
        val p1 = h1 % m
        val p2 = h2 % m
        if ((words.getLong((p1 >> 6).toInt) & (1L << (p1 & 63L).toInt)) != 0 &&
            (words.getLong((p2 >> 6).toInt) & (1L << (p2 & 63L).toInt)) != 0) hits += 1
      }
      i += 1
    }
    hits
  }

  /** Hashed-feature linear model application: Σ over grams of
    * weights[polyHash(gram) mod |weights|] — the map side of a
    * fasttext-style bag-of-hashed-ngrams classifier (the standard learned
    * quality filter in training-data pipelines). Left-to-right IEEE
    * accumulation in gram order, so DuckDB's list_reduce over the same
    * spelling reproduces the double bit-for-bit. One codegen'd JVM loop
    * per row (the [[bloomHits]] discipline — an aggregate() HOF here
    * would re-evaluate the interpreted hash per element). */
  def weightSum(grams: ArrayData, weights: ArrayData): Double = {
    val m = weights.numElements()
    var acc = 0.0
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val h = polyHash(grams.getUTF8String(i))
        acc += weights.getDouble((h % m).toInt)
      }
      i += 1
    }
    acc
  }

  /** MinHash signature: for each of k hash families, the min over shingles
    * of Spark-xxhash64(j, shingle) — bit-identical to
    * `array_min(transform(sh, s => xxhash64(lit(j), s)))`, computed in one
    * pass over the shingle array with precomputed per-family seeds. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) {
      // the column formulation is xxhash64(lit(j), shingle) with j an INT
      // literal — match its int-typed seed chaining exactly
      seeds(j) = XxHash64Function.hash(j, IntegerType, 42L)
      j += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        j = 0
        while (j < k) {
          val h = XxHash64Function.hash(s, StringType, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box: Long => java.lang.Long).asInstanceOf[Array[AnyRef]])
  }

  /** Greedy longest-match-first subword tokenization (the WordPiece /
    * unigram-vocab inference algorithm: at each position take the LONGEST
    * vocabulary entry that prefixes the remainder; no match → emit the
    * single character and advance one) applied to every word of `tokens`,
    * returning the flat subword stream. Deterministic: ties are
    * impossible (two equal-length matches at one position are the same
    * string), so the token stream is a pure function of (word, vocab) —
    * which is what puts a real tokenizer pass on the DuckDB oracle (a
    * recursive CTE re-derives the same greedy walk). Matching is per
    * UTF-16 code unit, == per character on the BMP/ASCII corpora this
    * serves. One JVM loop per row inside whole-stage codegen; the
    * first-char-indexed, length-descending candidate table is cached per
    * vocab literal (the table is rebuilt only when the vocab reference
    * changes — once per partition for a literal argument). */
  def wordpiece(tokens: ArrayData, vocab: ArrayData): ArrayData = {
    val table = wordpieceTable(vocab)
    val out = new java.util.ArrayList[AnyRef]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        var pos = 0
        while (pos < w.length) {
          val cands = table.get(w.charAt(pos))
          var found: String = null
          if (cands != null) {
            var c = 0
            while (c < cands.length && found == null) {
              val v = cands(c) // length-descending: first hit IS the longest
              if (v.length <= w.length - pos && w.startsWith(v, pos)) found = v
              c += 1
            }
          }
          val tok = if (found != null) found else w.substring(pos, pos + 1)
          out.add(UTF8String.fromString(tok))
          pos += tok.length
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // last-used vocab table, keyed by ArrayData reference: literal vocab
  // arguments evaluate to the same object for a partition's lifetime, so
  // this one-slot cache makes table construction once-per-partition (and
  // a miss merely rebuilds a ~vocab-sized map — correctness never depends
  // on a hit). Thread-local: executor task threads must not share slots.
  private val wpCache =
    new ThreadLocal[(ArrayData, java.util.HashMap[Character, Array[String]])]()

  private def wordpieceTable(vocab: ArrayData)
      : java.util.HashMap[Character, Array[String]] = {
    val cached = wpCache.get()
    if (cached != null && (cached._1 eq vocab)) return cached._2
    val byFirst = new java.util.HashMap[Character, java.util.ArrayList[String]]()
    val n = vocab.numElements()
    var i = 0
    while (i < n) {
      if (!vocab.isNullAt(i)) {
        val v = vocab.getUTF8String(i).toString
        if (v.nonEmpty) {
          var lst = byFirst.get(v.charAt(0))
          if (lst == null) { lst = new java.util.ArrayList[String](); byFirst.put(v.charAt(0), lst) }
          if (!lst.contains(v)) lst.add(v)
        }
      }
      i += 1
    }
    val table = new java.util.HashMap[Character, Array[String]]()
    byFirst.forEach { (ch, lst) =>
      val arr = lst.toArray(new Array[String](lst.size))
      java.util.Arrays.sort(arr, (a: String, b: String) => b.length - a.length)
      table.put(ch, arr)
    }
    wpCache.set((vocab, table))
    table
  }
}

/** word_ngrams(array<string>, n) -> array<string> */
case class WordNGrams(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    TextKernels.ngrams(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.expressions.TextKernels.ngrams($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordNGrams =
    copy(left = l, right = r)
}

/** minhash_poly(array<string>, k) -> array<long> — portable hash family. */
case class MinHashPolySig(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_poly"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_poly needs (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(sh: Any, k: Any): Any =
    TextKernels.minhashPoly(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.expressions.TextKernels.minhashPoly($s, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashPolySig =
    copy(left = l, right = r)
}

/** simhash_poly(array<string>) -> long — 62-bit portable simhash. */
case class SimHashPoly(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_poly"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_poly needs array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any =
    TextKernels.simhashPoly(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.TextKernels.simhashPoly($t)")

  override protected def withNewChildInternal(c: Expression): SimHashPoly = copy(child = c)
}

/** winnow_fps(string, k, w) -> array<long> — distinct winnowing
  * fingerprints of the codepoint stream (portable polynomial hashes). */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps needs (string, int, int), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    TextKernels.winnow(text.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) => s"graft.expressions.TextKernels.winnow($t, $k, $w)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFps =
    copy(first = f, second = s, third = t)
}

/** bloom_hits(array<string>, array<long>) -> long — count of grams with
  * both portable-hash bits set in the 64·|words|-bit Bloom table. */
case class BloomHits(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_hits needs (array<string>, array<long>), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(grams: Any, words: Any): Any =
    TextKernels.bloomHits(grams.asInstanceOf[ArrayData], words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w) => s"graft.expressions.TextKernels.bloomHits($g, $w)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomHits =
    copy(left = l, right = r)
}

/** weight_sum(array<string>, array<double>) -> double — hashed-feature
  * linear model application over the portable polynomial hash. */
case class WeightSum(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weight_sum"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"weight_sum needs (array<string>, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(grams: Any, weights: Any): Any =
    TextKernels.weightSum(grams.asInstanceOf[ArrayData], weights.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w) => s"graft.expressions.TextKernels.weightSum($g, $w)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WeightSum =
    copy(left = l, right = r)
}

/** minhash_sig(array<string>, k) -> array<long> */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(sh: Any, k: Any): Any =
    TextKernels.minhash(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.expressions.TextKernels.minhash($s, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
}

/** wordpiece(array<string>, array<string>) -> array<string> — greedy
  * longest-match subword tokenization of each word against the vocab. */
case class WordPiece(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"wordpiece needs (array<string>, array<string>), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(tokens: Any, vocab: Any): Any =
    TextKernels.wordpiece(tokens.asInstanceOf[ArrayData], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) => s"graft.expressions.TextKernels.wordpiece($t, $v)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordPiece =
    copy(left = l, right = r)
}
