package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the custom Catalyst expressions. Each is a
  * single static call from generated code — no virtual dispatch, no
  * boxing — so the expressions stay inside whole-stage codegen.
  *
  * All hashes are self-contained (FNV-1a base + xorshift-multiply
  * mixing) and seed-deterministic: results are reproducible across
  * partitions, executors, and runs, which dedup banding requires.
  */
object HashOps {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L
  final val Mix1 = 0xff51afd7ed558ccdL
  final val Mix2 = 0xc4ceb9fe1a85ec53L

  /** FNV-1a over UTF-8 bytes, then a murmur-style finalizer. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    fmix(h)
  }

  def fmix(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= Mix1
    h ^= h >>> 33; h *= Mix2
    h ^ (h >>> 33)
  }

  /** Per-seed rehash: cheap enough to derive k MinHash functions from
    * one base hash (standard one-permutation-family trick).
    */
  def reseed(h: Long, seed: Int): Long = fmix(h ^ (0x9e3779b97f4a7c15L * (seed + 1)))

  /** MinHash signature: k minimums in one pass over the shingle set. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = hash64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = reseed(base, j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** Distinct word n-gram shingles in one pass over the UTF-8 bytes.
    * Semantics identical to `array_distinct(transform(..., concat_ws
    * (" ", slice(split(trim(text), " "), i, n))))` — trim, split on
    * single space, join windows with single space — but ~10x faster:
    * no intermediate token arrays, no per-window array slices.
    */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val all = shingleList(text, n)
    val out = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i < all.numElements()) {
      out.add(all.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-document word n-gram OCCURRENCE COUNTS in one pass — the
    * map-side pre-aggregation of `explode(shingle_list) → groupBy
    * (doc, gram) count` (guide: aggregate before you shuffle, here
    * before the frame even exists): one (gram, k) struct per
    * DISTINCT gram, k its in-document multiplicity, first-occurrence
    * order. Downstream per-(doc, gram) frames start distinct-keyed,
    * so the corpus-wide count exchange the groupBy needed is gone.
    */
  def shingleCounts(text: UTF8String, n: Int): ArrayData = {
    val all = shingleList(text, n)
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < all.numElements()) {
      val g = all.getUTF8String(i)
      val c = m.get(g)
      m.put(g, if (c == null) 1L else c.longValue + 1L)
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue.longValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character q-grams in one pass over the UTF-8 bytes —
    * the Ed-Join candidate alphabet. Semantics identical to
    * `array_distinct(transform(sequence(1, length(text) − q + 1),
    * i -> substring(text, i, q)))` (SQL substring counts CHARACTERS,
    * so the walk tracks codepoint start offsets), but a single O(L)
    * pass: no index array, no per-window substring allocation churn,
    * and no array_distinct's quadratic non-primitive fallback.
    * Output order is first occurrence — deterministic; downstream
    * explodes into joins, so order never matters semantically.
    */
  def charGramSet(text: UTF8String, q: Int): ArrayData = {
    val bytes = text.getBytes
    // char start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    val starts = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) starts.add(i)
      i += 1
    }
    val nCh = starts.size()
    if (nCh < q) return new GenericArrayData(Array.empty[Any])
    starts.add(bytes.length)
    val out = new java.util.LinkedHashSet[Any]()
    var c = 0
    while (c + q <= nCh) {
      val from = starts.get(c)
      val len = starts.get(c + q) - from
      out.add(UTF8String.fromBytes(bytes, from, len))
      c += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Non-distinct variant of [[shingleSet]]: every window in stream
    * order (needed when downstream counts occurrences, e.g. the
    * repeated-bigram quality signal).
    */
  def shingleList(text: UTF8String, n: Int): ArrayData = {
    val t = text.trim()
    val bytes = t.getBytes
    if (bytes.isEmpty) return new GenericArrayData(Array.empty[Any])
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      val from = starts.get(w)
      val to = if (w + n < nTok) starts.get(w + n) - 2 else bytes.length - 1
      out(w) = UTF8String.fromBytes(bytes, from, to - from + 1)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature folded into LSH band hashes in one pass:
    * returns `bands` longs, band b = mix of signature rows
    * [b*rowsPerBand, (b+1)*rowsPerBand). Avoids materializing (or
    * worse, recomputing per band) the full signature.
    */
  def minhashBands(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = hash64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = reseed(base, j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val rowsPerBand = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset ^ b
      var r = b * rowsPerBand
      while (r < (b + 1) * rowsPerBand) {
        h = fmix(h ^ sig(r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  /** 64-bit SimHash: per-token hash votes on each bit position. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Exact Jaccard similarity of two string arrays with set
    * semantics (duplicates and nulls ignored) in one hash pass —
    * the fused form of size(intersect)/size(union), which would
    * build hash tables twice and materialize both result arrays.
    * Empty ∪ empty is defined as 0.0.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i)): Unit
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j)) {
        val s = b.getUTF8String(j)
        if (seenB.add(s) && setA.contains(s)) inter += 1
      }
      j += 1
    }
    val union = setA.size + seenB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Elementwise float-vector subtraction (IVF-PQ residuals). */
  def subFF(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Shannon entropy (bits per byte) of the UTF-8 byte distribution:
    * one histogram pass, ascending-bin summation (deterministic float
    * order, which the 4-decimal oracle rounding relies on).
    */
  def byteEntropy(s: UTF8String): Double = byteEntropy(s.getBytes)

  /** Binary overload: the multimodal payload path (same ascending-bin
    * accumulation, same oracle contract). */
  def byteEntropy(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toDouble
    val ln2 = Math.log(2.0)
    var e = 0.0
    var b = 0
    while (b < 256) {
      if (hist(b) > 0) {
        val p = hist(b) / n
        e -= p * (Math.log(p) / ln2)
      }
      b += 1
    }
    e
  }

  /** Per-frame mean byte value in BASIS POINTS over `nFrames` equal
    * slices of `bytes` (the scene-cut signature kernel): frame f
    * covers bytes [f·flen, f·flen+flen) with flen = len/nFrames
    * (trailing remainder ignored), mean = sum·10⁴ div (flen·255) —
    * exact integer truncation in the positive quadrant, so both
    * engines see the identical value. One pass over the payload, no
    * index array ever materialized (the r14 HOF formulation built a
    * `sequence(1, flen)` Int array PER FRAME before folding — a
    * multi-million-element allocation per frame on real MB
    * payloads). Overflow-free by construction: a JVM byte array is
    * < 2³¹ bytes, so sum ≤ 255·2³¹ ≈ 5.5e11 and sum·10⁴ ≈ 5.5e15
    * < 2⁶³ — the DECIMAL widening the hex replay needed is not
    * needed here, and there is no INT offset to wrap (the ADVICE r14
    * substring-offset hazard).
    */
  def frameMeans(bytes: Array[Byte], nFrames: Long): ArrayData = {
    val n = nFrames.toInt
    if (n <= 0 || bytes.length / n == 0)
      return new GenericArrayData(Array.emptyLongArray)
    val flen = bytes.length / n
    val out = new Array[Long](n)
    var f = 0
    while (f < n) {
      var s = 0L
      var i = f * flen
      val end = i + flen
      while (i < end) { s += bytes(i) & 0xff; i += 1 }
      out(f) = s * 10000L / (flen.toLong * 255L)
      f += 1
    }
    new GenericArrayData(out)
  }

  /** nibble_hist(payload): counts of the 16 HIGH-NIBBLE values over
    * a payload's bytes — the byte-value histogram kernel: one pass,
    * no hex encoding, no per-byte explode, no allocation beyond the
    * fixed 16-slot output (the [[frameMeans]] discipline). Counts
    * are longs, so no payload length can overflow a slot.
    */
  def nibbleHist(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      out((bytes(i) & 0xff) >>> 4) += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial rolling hash (base 31, mod 2^61-1) over UTF-8 bytes —
    * the classic Rabin-Karp document fingerprint.
    */
  def rollingHash(s: UTF8String): Long = {
    val Mod = (1L << 61) - 1
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h * 31 + b) mod 2^61-1; 128-bit-safe via Math.multiplyHigh
      val lo = h * 31
      val hi = Math.multiplyHigh(h, 31L)
      var acc = (lo & Mod) + ((hi << 3) | (lo >>> 61)) + (bytes(i) & 0xffL)
      if (acc >= Mod) acc -= Mod
      h = acc
      i += 1
    }
    h
  }

  /** Cosine similarity of two float vectors, accumulated in double
    * left-to-right (bit-compatible with a sequential SQL loop).
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plane coefficient u_{table,p,j}, uniform in [-1, 1): >>>11
    * leaves 53 random bits, /2^53 gives [0,1), *2-1 maps to [-1,1).
    */
  def planeCoef(table: Int, p: Int, j: Int): Double =
    (fmix((table.toLong * 64 + p) * 1000003L + j) >>> 11).toDouble /
      (1L << 53).toDouble * 2.0 - 1.0

  /** Random-hyperplane LSH signature: bit p = sign(v · u_p) where
    * u_p is a deterministic pseudo-random plane derived from fmix —
    * no stored plane matrix, any executor regenerates it on the fly.
    */
  def lshSignature(v: ArrayData, planes: Int, table: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        s += v.getFloat(j).toDouble * planeCoef(table, p, j)
        j += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Squared L2 distance of two float vectors, accumulated in double
    * left-to-right (PQ encode / LUT kernel).
    */
  def l2sqFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Z-normalized Euclidean distance of a double window against a
    * pre-z-normalized query pattern (UCR subsequence-match kernel).
    * Fold order is strictly left-to-right at every stage — sum, then
    * divide for the mean; squared-deviation sum, divide, sqrt for the
    * stddev; per-element ((x−m)/sd − zq)² sum, sqrt for the distance
    * — exactly the sequential `list_reduce` order the DuckDB oracle
    * replays, so results are bit-identical. A zero-variance (flat)
    * window cannot be z-normalized and yields NaN (callers filter).
    */
  def znormDist(w: ArrayData, zq: ArrayData): Double = {
    val n = w.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { m += w.getDouble(i); i += 1 }
    m /= n
    var v = 0.0
    i = 0
    while (i < n) {
      val d = w.getDouble(i) - m
      v += d * d
      i += 1
    }
    val sd = math.sqrt(v / n)
    if (!(sd > 0.0)) return Double.NaN
    var s = 0.0
    i = 0
    while (i < n) {
      val d = (w.getDouble(i) - m) / sd - zq.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** [[znormDist]] over plain double arrays — the streaming ring
    * buffer's variant (no InternalRow in flatMapGroupsWithState).
    * Fold order mirrors the ArrayData version exactly, so streaming
    * emissions are bit-identical to the batch operator's scores.
    */
  def znormDistD(w: Array[Double], zq: Array[Double]): Double = {
    val n = w.length
    var m = 0.0
    var i = 0
    while (i < n) { m += w(i); i += 1 }
    m /= n
    var v = 0.0
    i = 0
    while (i < n) {
      val d = w(i) - m
      v += d * d
      i += 1
    }
    val sd = math.sqrt(v / n)
    if (!(sd > 0.0)) return Double.NaN
    var s = 0.0
    i = 0
    while (i < n) {
      val d = (w(i) - m) / sd - zq(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Index of the most-cosine-similar packed centroid (ties → lower
    * index). One fused pass replaces the explode×|cells| + window
    * argmax formulation, whose per-vector fan-out shuffles
    * corpus×cells rows — this touches only the broadcast model.
    */
  def nearestIdx(v: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = -1
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val c = cosineFF(v, cents.getArray(i))
      if (c > bestCos) { bestCos = c; best = i }
      i += 1
    }
    best
  }

  /** Top-k packed-centroid indices by cosine (desc, ties → lower
    * index): the multi-probe selection, k is tiny so selection sort.
    */
  def topIdx(v: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val cos = new Array[Double](n)
    var i = 0
    while (i < n) { cos(i) = cosineFF(v, cents.getArray(i)); i += 1 }
    val kk = math.min(k, n)
    val out = new Array[Int](kk)
    val taken = new Array[Boolean](n)
    var j = 0
    while (j < kk) {
      var best = -1
      var bestCos = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i) && cos(i) > bestCos) { bestCos = cos(i); best = i }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode against a flat (s, code, sub) codebook sorted by
    * (s, code): per subspace s the code minimizing L2 to the vector's
    * s-th slice (ties → lower code, matching min_by(struct(d, code))).
    * Subspaces with no codebook entry stay -1. One pass over the
    * broadcast codebook replaces the per-(vector, subspace) explode +
    * ×codes join + argmin re-aggregation — the encode becomes a scan.
    */
  def pqEncode(vec: ArrayData, flat: ArrayData): ArrayData = {
    val n = flat.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val subLen = flat.getStruct(0, 3).getArray(2).numElements()
    val m = vec.numElements() / subLen
    val codes = new Array[Int](m)
    java.util.Arrays.fill(codes, -1)
    val bestD = new Array[Double](m)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    var i = 0
    while (i < n) {
      val e = flat.getStruct(i, 3)
      val s = e.getInt(0)
      if (s >= 0 && s < m) {
        val sub = e.getArray(2)
        var d = 0.0
        var j = 0
        while (j < subLen) {
          val diff = vec.getFloat(s * subLen + j).toDouble - sub.getFloat(j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD(s)) { bestD(s) = d; codes(s) = e.getInt(1) }
      }
      i += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance sum Σ_s lut[s][codes(s)] over a flat
    * (s, code, d) query lookup table; NaN when any subspace fails to
    * match (the all-m-subspaces guard). Replaces the codes-explode +
    * LUT join + (q, vec) re-aggregation shuffle with a scan of the
    * broadcast LUT.
    */
  def adcSum(codes: ArrayData, flat: ArrayData): Double = {
    val m = codes.numElements()
    var sum = 0.0
    var matched = 0
    val n = flat.numElements()
    var i = 0
    while (i < n) {
      val e = flat.getStruct(i, 3)
      val s = e.getInt(0)
      if (s >= 0 && s < m && e.getInt(1) == codes.getInt(s)) {
        sum += e.getDouble(2)
        matched += 1
      }
      i += 1
    }
    if (matched == m) sum else Double.NaN
  }

  /** Dot product of two float vectors (IVF / pre-normalized path). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }
}
