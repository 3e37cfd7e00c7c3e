package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.GraftInternal.{col => mkCol, expr => exprOf}

/** Product-quantization ANN — the third scale path (besides LSH multi-probe
  * and IVF lists): each vector is compressed to M sub-space code indices
  * (M bytes against KB of floats), and a query ranks candidates by
  * asymmetric distance (ADC) — a lookup-table sum, no float vectors touched
  * at query time. At 100 TB of raw embeddings the codes index is ~64-384×
  * smaller; a brute ADC scan over codes is a narrow map + TakeOrdered with
  * ZERO shuffle, and the codes column persists as table state (encode once,
  * query many).
  *
  * The codebook here is DETERMINISTIC the same way the IVF coarse quantizer
  * is (q35): the K codes of every sub-space are the sub-vectors of the K
  * smallest-id corpus vectors in a residue class — drawn from the data, no
  * training iterations — so a cross-engine oracle can rebuild the identical
  * codebook, codes and ranking from scratch. Swap in per-sub-space k-means
  * codebooks at deployment without touching the plan shape.
  *
  * Determinism contract (mirrored by the DuckDB oracle): distances are
  * squared euclidean accumulated in ascending dimension order in doubles
  * (float inputs widen exactly), argmin ties take the smaller code index,
  * ADC sums the M per-sub-space terms in ascending sub-space order, and the
  * final top-k ties break by id ascending — bit-exact across engines.
  */
object Pq {

  /** the deterministic codebook: [m][k][subDim] doubles. Collects K vectors
    * (codebook rows only — driver state is K×dim doubles, corpus-size
    * independent). */
  def codebook(df: DataFrame, idCol: String, vecCol: String,
               m: Int, kCodes: Int, every: Int, residue: Int)
      : Array[Array[Array[Double]]] = {
    val rows = df.filter(pmod(col(idCol).cast("long"), lit(every)) === residue)
      .orderBy(col(idCol).cast("long").asc)
      .select(col(vecCol)).limit(kCodes).collect()
    require(rows.length == kCodes,
      s"codebook needs $kCodes source vectors, found ${rows.length}")
    val vecs = rows.map(_.getSeq[Float](0).toArray)
    val dim = vecs(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m sub-spaces")
    val sub = dim / m
    Array.tabulate(m, kCodes, sub)((s, j, d) => vecs(j)(s * sub + d).toDouble)
  }

  /** per-row PQ encoding: array<int> of M code indices. */
  def pq_encode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    mkCol(PqEncodeExpr(exprOf(vec), cb))

  /** per-row ADC distance of a codes array against a query lookup table. */
  def pq_adc(codes: Column, lut: Array[Array[Double]]): Column =
    mkCol(PqAdcExpr(exprOf(codes), lut))

  /** the query's lookup table: lut[s][j] = ||q_s − c_{s,j}||² (squared,
    * ascending-dimension accumulation). */
  def lookupTable(query: Array[Float], cb: Array[Array[Array[Double]]])
      : Array[Array[Double]] = {
    val m = cb.length; val sub = cb(0)(0).length
    Array.tabulate(m, cb(0).length) { (s, j) =>
      var acc = 0.0; var d = 0
      while (d < sub) {
        val diff = query(s * sub + d).toDouble - cb(s)(j)(d)
        acc += diff * diff; d += 1
      }
      acc
    }
  }

  /** Encode the corpus ONCE into a persistable codes index (id, codes):
    * one narrow map pass, no shuffle; at scale this is written back as a
    * table column and every query touches only the M-byte codes. */
  def encodeAll(df: DataFrame, idCol: String, vecCol: String,
                cb: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      pq_encode(col(vecCol), cb).as("codes"))

  /** PQ top-k: encode (or reuse a pre-encoded index via encodeAll) and rank
    * every candidate by ADC ascending, id-ascending ties. The plan is a
    * map + TakeOrderedAndProject — zero shuffle, zero joins. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             query: Array[Float], k: Int, m: Int = 8, kCodes: Int = 16,
             every: Int = 5, residue: Int = 2): DataFrame = {
    val cb = codebook(df, idCol, vecCol, m, kCodes, every, residue)
    val lut = lookupTable(query, cb)
    encodeAll(df, idCol, vecCol, cb)
      .select(col("id").as(idCol),
        concat_ws(",", col("codes")).as("codes"),
        pq_adc(col("codes"), lut).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }
}

/** pq_encode(vec): the M argmin code indices of a float vector against the
  * codebook (a broadcast-by-closure literal — K×dim doubles per task, not
  * per row). Squared-euclid, ascending-dim accumulation, ties → smaller j. */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = cb.length; val kCodes = cb(0).length; val sub = cb(0)(0).length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < kCodes) {
        var acc = 0.0; var d = 0
        while (d < sub) {
          val diff = arr.getFloat(s * sub + d).toDouble - cb(s)(j)(d)
          acc += diff * diff; d += 1
        }
        if (acc < bestD) { bestD = acc; best = j } // strict: ties keep smaller j
        j += 1
      }
      codes(s) = best; s += 1
    }
    new GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** pq_adc(codes): Σ_s lut[s][codes[s]] in ascending sub-space order. */
case class PqAdcExpr(child: Expression, lut: Array[Array[Double]])
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    var acc = 0.0; var s = 0
    while (s < lut.length) { acc += lut(s)(codes.getInt(s)); s += 1 }
    acc
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_adc"
}
