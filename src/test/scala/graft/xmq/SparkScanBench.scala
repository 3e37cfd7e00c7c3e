package graft.xmq

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expr.XmqFunctions

/** Scan-path probe: Test/runMain graft.xmq.SparkScanBench <tableDir> */
object SparkScanBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new graft.lake.GraftTable(spark, dir)
    val df = t.scan().cache()
    val n = df.count()
    println(s"rows=$n")

    var t0 = System.nanoTime()
    val c1 = df.filter(XmqFunctions.xmq_roundtrip_ok(col("content"), col("lang"))).count()
    println(f"filter roundtrip_ok: ${(System.nanoTime() - t0) / 1e9}%.2f s ok=$c1")

    t0 = System.nanoTime()
    val c2 = df.select(XmqFunctions.xmq_roundtrip(col("content"), col("lang")).as("rt"))
      .filter(length(col("rt")) > 0).count()
    println(f"select roundtrip:    ${(System.nanoTime() - t0) / 1e9}%.2f s ok=$c2")

    t0 = System.nanoTime()
    val c3 = df.select(length(col("content"))).agg(sum(col("length(content)"))).head().getLong(0)
    println(f"plain length agg:    ${(System.nanoTime() - t0) / 1e9}%.2f s bytes=$c3")
    spark.stop()
  }
}
