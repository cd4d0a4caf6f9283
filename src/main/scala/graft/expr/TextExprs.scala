package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Synth.mix64

/** Single-pass text-hashing expressions for the dedup operators.
  *
  * Why expressions and not column math: a MinHash signature expressed as
  * `transform(sequence(0,m−1), seed → array_min(transform(shingles, hash)))`
  * re-evaluates the shingle array m times per row and re-inlines the whole
  * subtree into every LSH band (Catalyst CollapseProject) — measured 16×
  * recompute. One CodegenFallback expression computes tokens → shingles →
  * m minhashes → band hashes in a single pass per row.
  */
object TextHash {
  /** 64-bit hash of a string region via splitmix-folded bytes — cheap,
    * deterministic, platform-independent.
    */
  def hashChars(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  /** MinHash band hashes of whitespace-tokenized k-shingles: m = bands×rows
    * hash families h_i(x) = mix64(x ^ mix64(i)); band j's hash folds its
    * `rows` minhashes with mix64.
    */
  def minhashBands(text: String, k: Int, bands: Int, rows: Int): Array[Long] = {
    val m = bands * rows
    val mins = Array.fill(m)(Long.MaxValue)
    // shingle boundaries: token start offsets
    val n = text.length
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var i = 0
    while (i < n) { if (text.charAt(i) == ' ') starts += (i + 1); i += 1 }
    starts += n + 1 // sentinel: end of text + virtual space
    val nTok = starts.length - 1
    val nSh = math.max(1, nTok - k + 1)
    var s = 0
    while (s < nSh) {
      val from = starts(s)
      val until = math.min(n, starts(math.min(s + k, nTok)) - 1)
      val base = hashChars(text, from, until)
      var j = 0
      while (j < m) {
        val h = mix64(base ^ mix64(j.toLong))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L + b
      var r = 0
      while (r < rows) { h = mix64(h ^ mins(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash(text: String): Long = {
    val votes = new Array[Int](64)
    val n = text.length
    var from = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > from) {
          val h = hashChars(text, from, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        from = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** minhash_bands(text) → array<long> of `bands` LSH bucket hashes. */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHash.minhashBands(v.asInstanceOf[UTF8String].toString, k, bands, rows))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash(text) → long. */
case class SimHashExpr(child: Expression) extends UnaryExpression
    with CodegenFallback with GraftExpectsInputTypes {
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bpe_count(text) → long: Σ over whitespace tokens of the BPE symbol
  * count under the (driver-trained, plan-shipped) merge list — a single
  * pass per row, no shuffle. The merge list is literal metadata like the
  * IVF centroids (AnnOps): ~50k pairs at production vocab sizes, a few KB
  * here. Rank lookup precompiles once per task via the transient lazy val.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with GraftExpectsInputTypes {
  @transient private lazy val ranks = graft.ops.BpeTokenizer.ranksOf(merges)
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    graft.ops.BpeTokenizer.countText(v.asInstanceOf[UTF8String].toString, ranks)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextFunctions {
  def minhash_bands(text: Column, k: Int, bands: Int, rows: Int): Column =
    Bridge.column(MinHashBandsExpr(Bridge.expression(text), k, bands, rows))
  def simhash64(text: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(text)))
  def bpe_count(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeCountExpr(Bridge.expression(text), merges))
}
