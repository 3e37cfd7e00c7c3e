package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: split q19's 10x pair count into intra-copy vs cross-copy. */
object ScaleDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("scaledebug")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs =
      if (args.contains("emb"))
        graft.pipeline.Dedup.embeddingPairsLsh(
          spark.read.parquet("/tmp/graft-scale-10x/embeddings.parquet"),
          "vec_id", "embedding", threshold = 0.3, planes = 8, bands = 4)
          .withColumnRenamed("id_a", "id_a0").withColumnRenamed("id_b", "id_b0")
          .select(col("id_a0").as("id_a"), col("id_b0").as("id_b"))
      else graft.pipeline.Dedup.simHashPairs(
        spark.read.parquet("/tmp/graft-scale-10x/documents.parquet"), "doc_id", "text",
        maxHamming = 3)
    val r = pairs.select(
      when(($"id_a" / 100000000L).cast("long") === ($"id_b" / 100000000L).cast("long"), 1L)
        .otherwise(0L).as("intra"))
      .agg(sum($"intra").as("intra"), count(lit(1)).as("total")).head()
    println(s"RESULT intra=${r.getLong(0)} total=${r.getLong(1)}")
    // what do cross-copy colliding texts look like?
    val docs = spark.read.parquet("/tmp/graft-scale-10x/documents.parquet")
      .select($"doc_id", $"text")
    val cross = pairs.filter(($"id_a" / 100000000L).cast("long") =!= ($"id_b" / 100000000L).cast("long"))
      .limit(3)
      .join(docs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(docs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
    cross.collect().foreach(row => println("CROSS " + row.mkString(" | ").take(300)))
    spark.stop()
  }
}
