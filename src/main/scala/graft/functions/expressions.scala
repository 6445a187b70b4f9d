package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup / similarity hot paths.
  *
  * Each `doGenCode` emits a single static call into [[HashOps]], so
  * projections using these stay inside whole-stage codegen (no UDF
  * serialization, no boxing of the array arguments).
  */
object expressions {
  // static forwarders on the companion-less object's plain class —
  // callable from janino-generated code as ordinary static methods
  private val ops = "graft.functions.HashOps"

  /** minhash_sig(shingles, k): one-pass k-wide MinHash signature. */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.minhash(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.minhash($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** shingle_set(text, n): distinct word n-gram shingles, one pass. */
  case class ShingleSet(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.shingleSet(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.shingleSet($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
    override def prettyName: String = "shingle_set"
  }

  /** shingle_counts(text, n): per-doc word n-gram occurrence counts
    * as (g, k) structs — the map-side pre-aggregation of
    * `explode(shingle_list) → groupBy(doc, gram) count`, one pass. */
  case class ShingleCounts(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("k", LongType, nullable = false))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.shingleCounts(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.shingleCounts($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleCounts = copy(child = c)
    override def prettyName: String = "shingle_counts"
  }

  /** char_gram_set(text, q): distinct character q-grams, one pass. */
  case class CharGramSet(child: Expression, q: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.charGramSet(v.asInstanceOf[UTF8String], q)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.charGramSet($c, $q)")
    override protected def withNewChildInternal(c: Expression): CharGramSet = copy(child = c)
    override def prettyName: String = "char_gram_set"
  }

  /** shingle_list(text, n): all word n-grams, duplicates kept. */
  case class ShingleList(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.shingleList(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.shingleList($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleList = copy(child = c)
    override def prettyName: String = "shingle_list"
  }

  /** minhash_bands(shingles, k, bands): signature + banding fused. */
  case class MinHashBands(child: Expression, k: Int, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.minhashBands(v.asInstanceOf[ArrayData], k, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.minhashBands($c, $k, $bands)")
    override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
    override def prettyName: String = "minhash_bands"
  }

  /** simhash64(tokens): 64-bit SimHash of a token array. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      HashOps.simhash(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.simhash($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** rolling_hash64(text): Rabin-Karp polynomial fingerprint. */
  case class RollingHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      HashOps.rollingHash(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.rollingHash($c)")
    override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(child = c)
    override def prettyName: String = "rolling_hash64"
  }

  /** byte_entropy(text): Shannon entropy (bits/byte) of the UTF-8
    * byte distribution — single-pass 256-bin histogram, no explode.
    */
  case class ByteEntropy(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      HashOps.byteEntropy(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.byteEntropy($c)")
    override protected def withNewChildInternal(c: Expression): ByteEntropy = copy(child = c)
    override def prettyName: String = "byte_entropy"
  }

  /** bin_entropy(payload): [[ByteEntropy]] over a BINARY column —
    * the multimodal twin (corrupt/encrypted payload detection). */
  case class BinEntropy(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      HashOps.byteEntropy(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.byteEntropy($c)")
    override protected def withNewChildInternal(c: Expression): BinEntropy = copy(child = c)
    override def prettyName: String = "bin_entropy"
  }

  /** frame_means(payload, n_frames): per-frame mean byte value in
    * basis points over n equal payload slices — the scene-cut
    * signature, one codegen'd pass over the bytes with no index-array
    * materialization (see [[HashOps.frameMeans]]).
    */
  case class FrameMeans(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(p: Any, n: Any): Any =
      HashOps.frameMeans(p.asInstanceOf[Array[Byte]], n.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (p, n) => s"$ops.frameMeans($p, $n)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): FrameMeans =
      copy(left = l, right = r)
    override def prettyName: String = "frame_means"
  }

  /** nibble_hist(payload): 16 high-nibble byte-value counts over a
    * BINARY payload — one codegen'd pass, no hex encoding, no
    * per-byte explode (see [[HashOps.nibbleHist]]).
    */
  case class NibbleHist(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.nibbleHist(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.nibbleHist($c)")
    override protected def withNewChildInternal(c: Expression): NibbleHist = copy(child = c)
    override def prettyName: String = "nibble_hist"
  }

  /** cosine_sim(a, b) over float vectors, double accumulation. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$ops.cosineFF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim"
  }

  /** dot_ff(a, b): plain dot product (pre-normalized vectors). */
  case class DotFF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$ops.dotFF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFF =
      copy(left = l, right = r)
    override def prettyName: String = "dot_ff"
  }

  /** l2_sq(a, b): squared Euclidean distance (PQ encode/LUT kernel). */
  case class L2Sq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.l2sqFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$ops.l2sqFF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
      copy(left = l, right = r)
    override def prettyName: String = "l2_sq"
  }

  /** znorm_dist(win, zq): z-normalized Euclidean distance of a
    * double window against a pre-z-normalized pattern — the UCR
    * subsequence-match fold fused into one codegen'd kernel (NaN for
    * zero-variance windows). Replaces a 3-stage `aggregate`/
    * `zip_with` higher-order-function chain that never entered
    * whole-stage codegen.
    */
  case class ZnormDist(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(w: Any, zq: Any): Any =
      HashOps.znormDist(w.asInstanceOf[ArrayData], zq.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (w, zq) => s"$ops.znormDist($w, $zq)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ZnormDist =
      copy(left = l, right = r)
    override def prettyName: String = "znorm_dist"
  }

  /** jaccard_sim(a, b): exact set Jaccard of two string arrays. */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$ops.jaccard($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
      copy(left = l, right = r)
    override def prettyName: String = "jaccard_sim"
  }

  /** vec_sub(a, b): elementwise float subtraction (PQ residuals). */
  case class VecSubFF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.subFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$ops.subFF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSubFF =
      copy(left = l, right = r)
    override def prettyName: String = "vec_sub"
  }

  /** nearest_idx(vec, cents): 0-based index of the most-cosine-
    * similar centroid in a packed array<array<float>> model
    * (ties → lower index); -1 when the model is empty.
    */
  case class NearestIdx(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any, c: Any): Any =
      HashOps.nearestIdx(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, c) => s"$ops.nearestIdx($v, $c)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestIdx =
      copy(left = l, right = r)
    override def prettyName: String = "nearest_idx"
  }

  /** top_idx(vec, cents, k): the k most-cosine-similar packed-model
    * indices, descending (multi-probe cell selection).
    */
  case class TopIdx(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any, c: Any): Any =
      HashOps.topIdx(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, c) => s"$ops.topIdx($v, $c, $k)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): TopIdx =
      copy(left = l, right = r)
    override def prettyName: String = "top_idx"
  }

  /** pq_encode(vec, flat_codebook): per-subspace nearest-code array
    * against a flat (s, code, sub) codebook sorted by (s, code).
    */
  case class PqEncode(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any, cb: Any): Any =
      HashOps.pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, cb) => s"$ops.pqEncode($v, $cb)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(left = l, right = r)
    override def prettyName: String = "pq_encode"
  }

  /** adc_sum(codes, flat_lut): asymmetric-distance sum over a flat
    * (s, code, d) lookup table; NaN when a subspace has no entry.
    */
  case class AdcSum(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(codes: Any, lut: Any): Any =
      HashOps.adcSum(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (codes, lut) => s"$ops.adcSum($codes, $lut)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcSum =
      copy(left = l, right = r)
    override def prettyName: String = "adc_sum"
  }

  /** lsh_sig(vec, planes, table): random-hyperplane signature bits
    * for one hash table of a multi-table LSH index.
    */
  case class LshSig(child: Expression, planes: Int, table: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      HashOps.lshSignature(v.asInstanceOf[ArrayData], planes, table)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$ops.lshSignature($c, $planes, $table)")
    override protected def withNewChildInternal(c: Expression): LshSig = copy(child = c)
    override def prettyName: String = "lsh_sig"
  }

  // ---- Column-level API ----
  def minhash_sig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
  def minhash_bands(c: Column, k: Int, bands: Int): Column =
    GraftBridge.column(MinHashBands(GraftBridge.expression(c), k, bands))
  def shingle_set(c: Column, n: Int): Column =
    GraftBridge.column(ShingleSet(GraftBridge.expression(c), n))
  def char_gram_set(c: Column, q: Int): Column =
    GraftBridge.column(CharGramSet(GraftBridge.expression(c), q))
  def shingle_counts(c: Column, n: Int): Column =
    GraftBridge.column(ShingleCounts(GraftBridge.expression(c), n))
  def shingle_list(c: Column, n: Int): Column =
    GraftBridge.column(ShingleList(GraftBridge.expression(c), n))
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  def rolling_hash64(c: Column): Column =
    GraftBridge.column(RollingHash64(GraftBridge.expression(c)))
  def byte_entropy(c: Column): Column =
    GraftBridge.column(ByteEntropy(GraftBridge.expression(c)))
  def bin_entropy(c: Column): Column =
    GraftBridge.column(BinEntropy(GraftBridge.expression(c)))
  def frame_means(payload: Column, nFrames: Column): Column =
    GraftBridge.column(FrameMeans(GraftBridge.expression(payload),
      GraftBridge.expression(nFrames)))
  def nibble_hist(payload: Column): Column =
    GraftBridge.column(NibbleHist(GraftBridge.expression(payload)))
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dot_ff(a: Column, b: Column): Column =
    GraftBridge.column(DotFF(GraftBridge.expression(a), GraftBridge.expression(b)))
  def l2_sq(a: Column, b: Column): Column =
    GraftBridge.column(L2Sq(GraftBridge.expression(a), GraftBridge.expression(b)))
  def lsh_sig(c: Column, planes: Int, table: Int): Column =
    GraftBridge.column(LshSig(GraftBridge.expression(c), planes, table))
  def vec_sub(a: Column, b: Column): Column =
    GraftBridge.column(VecSubFF(GraftBridge.expression(a), GraftBridge.expression(b)))
  def znorm_dist(w: Column, zq: Column): Column =
    GraftBridge.column(ZnormDist(GraftBridge.expression(w), GraftBridge.expression(zq)))
  def jaccard_sim(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  def nearest_idx(v: Column, cents: Column): Column =
    GraftBridge.column(NearestIdx(GraftBridge.expression(v), GraftBridge.expression(cents)))
  def top_idx(v: Column, cents: Column, k: Int): Column =
    GraftBridge.column(TopIdx(GraftBridge.expression(v), GraftBridge.expression(cents), k))
  def pq_encode(v: Column, cb: Column): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), GraftBridge.expression(cb)))
  def adc_sum(codes: Column, lut: Column): Column =
    GraftBridge.column(AdcSum(GraftBridge.expression(codes), GraftBridge.expression(lut)))
}
