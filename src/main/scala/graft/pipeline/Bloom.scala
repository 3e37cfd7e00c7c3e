package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, BooleanType}
import org.apache.spark.sql.GraftInternal.{col => mkCol, expr => exprOf}

/** Fixed-size Bloom filter over 64-bit keys, as a Spark typed Aggregator.
  *
  * The incremental-dedup primitive: an existing corpus's key set folds into
  * one bitmap of `bits` bits via bitwise-OR partial aggregation — each
  * partition contributes ONE buffer row (bits/8 bytes) to the final merge,
  * never its keys — so a 10^11-row corpus costs one scan plus
  * partitions × bitmap bytes of shuffle. Membership tests then run as a
  * per-row expression against the broadcast/literal bitmap: negatives are
  * DEFINITELY absent (no false negatives by construction), positives fall
  * through to an exact verify join over the shrunken candidate set.
  *
  * Bit positions are splitmix64-derived (TextOps.mix) so the filter is
  * deterministic across runs and engines: bit_i(h) = mix(h ^ seed_i) mod
  * bits, seeds the same golden-ratio multiples the minhash family uses. */
class BloomFilterAgg(bits: Int, numHashes: Int)
  extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Byte]] {
  require(bits > 0 && (bits & 63) == 0, "bits must be a positive multiple of 64")

  def zero: Array[Long] = new Array[Long](bits >>> 6)
  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val j = Bloom.bitIndex(h, i, bits)
      buf(j >>> 6) |= 1L << (j & 63)
      i += 1
    }
    buf
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  def finish(buf: Array[Long]): Array[Byte] = {
    // little-endian long→byte layout; Bloom.testBit reads the same layout
    val out = new Array[Byte](buf.length << 3)
    var k = 0
    while (k < buf.length) {
      var b = 0
      while (b < 8) { out((k << 3) + b) = (buf(k) >>> (8 * b)).toByte; b += 1 }
      k += 1
    }
    out
  }
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
}

object Bloom {
  @inline def bitIndex(h: Long, i: Int, bits: Int): Int =
    java.lang.Long.remainderUnsigned(
      TextOps.mix(h ^ (0x9e3779b97f4a7c15L * (i + 1))), bits.toLong).toInt

  @inline def testBit(bytes: Array[Byte], j: Int): Boolean =
    ((bytes(j >>> 3) >>> (j & 7)) & 1) != 0

  def containsLocal(bytes: Array[Byte], h: Long, bits: Int, numHashes: Int): Boolean = {
    var i = 0
    while (i < numHashes) {
      if (!testBit(bytes, bitIndex(h, i, bits))) return false
      i += 1
    }
    true
  }

  /** fold a LongType key column of `df` into one bitmap (one aggregation
    * job; the only driver-side value is the fixed-size byte array). */
  def bloomFrom(df: DataFrame, hCol: String, bits: Int, numHashes: Int): Array[Byte] = {
    import df.sparkSession.implicits._
    df.select(org.apache.spark.sql.functions.col(hCol).cast("long")).as[Long]
      .select(new BloomFilterAgg(bits, numHashes).toColumn.name("bloom"))
      .head()
  }

  /** per-row membership test of a LongType key against a bitmap column
    * (normally a Binary literal of the aggregated filter). */
  def bloom_contains(h: Column, bitmap: Column, bits: Int, numHashes: Int): Column =
    mkCol(BloomContainsExpr(exprOf(h), exprOf(bitmap), bits, numHashes))
}

/** bloom_contains(hash, bitmap): true iff all numHashes probe bits are set.
  * The bitmap child is normally a literal (one shared byte array, not a
  * per-row copy), so the test is numHashes mixes + bit reads per row. */
case class BloomContainsExpr(left: Expression, right: Expression,
                             bits: Int, numHashes: Int)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override protected def nullSafeEval(h: Any, bm: Any): Any =
    Bloom.containsLocal(bm.asInstanceOf[Array[Byte]], h.asInstanceOf[Long],
      bits, numHashes)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}
