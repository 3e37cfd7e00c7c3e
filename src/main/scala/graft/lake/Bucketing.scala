package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Storage bucketing for graft tables — the layout behind STORAGE-PARTITIONED
  * JOINS (the Iceberg/SPARK-37375 feature): once two tables are
  * bucket-clustered on the same key with the same bucket count, a join on
  * that key needs NO shuffle on either side — at 100 TB the difference
  * between re-shuffling the fact table per join and reading co-located
  * buckets in place.
  *
  * The bucket function is `pmod(xxhash64(col), n)` — exactly Spark's
  * `xxhash64` expression (seed 42), so the write-side routing column, the
  * per-file purity stats, and the V2 [[BucketFunction]] the catalog exposes
  * for Catalyst's `TransformExpression` compatibility check all compute the
  * identical value.
  */
object Bucketing {

  /** the bucket id of each row: pmod(xxhash64(col), n), as an int column. */
  def bucketCol(column: String, n: Int): Column =
    pmod(xxhash64(col(column)), lit(n.toLong)).cast("int")

  /** Exact bucket→shuffle-partition routing: `df.repartition(n, expr)` places
    * a row in partition pmod(murmur3(expr, 42), n), NOT partition `expr` —
    * so repartitioning on the bucket id directly would mix several buckets
    * into one task (and leave others empty), breaking the one-pure-file-per-
    * bucket layout. Instead each bucket id b is remapped to a representative
    * int r(b) chosen (once, driver-side, O(n) probes) so that murmur3 routes
    * r(b) to partition b — the shuffle then lands every bucket in its own
    * task deterministically, with no RDD round-trip and no sampling. */
  private[lake] def routeValues(n: Int): Array[Int] = {
    val out = Array.fill(n)(-1)
    var found = 0
    var i = 0
    while (found < n) {
      val h = Murmur3_x86_32.hashInt(i, 42)
      val b = ((h % n) + n) % n
      if (out(b) < 0) { out(b) = i; found += 1 }
      i += 1
    }
    out
  }

  /** Repartition df into exactly n tasks, task b holding exactly bucket b's
    * rows (each task then writes one bucket-pure data file). With
    * `sorted=true` each task additionally sorts by the bucket column, so the
    * written file carries an order the scan can REPORT (SupportsReportOrdering)
    * — a later sort-merge join on the column then needs neither shuffle NOR
    * sort. */
  def route(df: DataFrame, column: String, n: Int,
            sorted: Boolean = false): DataFrame = {
    val remap = routeValues(n).toSeq
    val routed = df.withColumn("_graft_route",
        element_at(typedLit(remap), bucketCol(column, n) + 1))
      .repartition(n, col("_graft_route"))
      .drop("_graft_route")
    if (sorted) routed.sortWithinPartitions(col(column)) else routed
  }

  /** V2 bucket function (FunctionCatalog name "bucket"): lets Catalyst
    * resolve the `bucket(n, col)` transform the scan reports in its
    * KeyGroupedPartitioning. SPJ compatibility compares the two sides'
    * bound functions by canonicalName + the numBuckets literal; the function
    * is only ever EVALUATED on the rare partially-clustered paths, where it
    * must (and does) match the write-side routing exactly. */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(xxhash64(col), n) — graft storage bucketing"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets INT, col STRING), got $inputType")
      BucketBound
    }
  }

  object BucketBound extends ScalarFunction[Integer]
    with ReducibleFunction[Integer, Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // xxhash64 expression semantics: a null input leaves the seed untouched
      val h =
        if (input.isNullAt(1)) 42L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(input.getUTF8String(1), StringType, 42L)
      (((h % n) + n) % n).toInt
    }

    /** MISMATCHED bucket counts (a fact table re-bucketized to kn while its
      * dims stay at n): because bucket(v) = xxhash64(v) mod N, the finer
      * side's bucket id reduces EXACTLY to the coarser space by `% n`
      * whenever n divides kn — Spark then coalesces the finer partitions per
      * reduced value and the join still needs no shuffle
      * (spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled). */
    override def reducer(thisN: Int, other: ReducibleFunction[_, _],
                         otherN: Int): Reducer[Integer, Integer] =
      if (other != BucketBound) null
      else if (thisN == otherN) null // identical transforms: nothing to reduce
      else if (otherN > 0 && thisN % otherN == 0) new ModReducer(otherN)
      else null // coarser (or incompatible) side: the other side reduces
  }

  /** v → v mod n, shipped to tasks (Spark serializes the reducer into the
    * partition-coalescing closure — a lambda would not be Serializable). */
  private final class ModReducer(n: Int) extends Reducer[Integer, Integer]
    with Serializable {
    override def reduce(v: Integer): Integer =
      Integer.valueOf(((v.intValue() % n) + n) % n)
  }
}
