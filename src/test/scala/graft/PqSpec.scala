package graft

import graft.pipeline.{Ann, Pq}
import org.apache.spark.sql.functions._

/** Product-quantization ANN: deterministic codebook/codes, the ADC
  * reconstruction identity, persistable codes index, recall sanity vs the
  * exact baseline, and the zero-shuffle plan shape. */
class PqSpec extends SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def queryVec: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

  test("codes are deterministic and match a driver-side recompute") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") =!= 0)
    val cb = Pq.codebook(corpus, "vec_id", "embedding", 8, 16, 5, 2)
    val got = Pq.encodeAll(corpus, "vec_id", "embedding", cb)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    // recompute 20 rows in plain Scala, same contract
    val rows = corpus.select("vec_id", "embedding").limit(20).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val expect = (0 until 8).map { s =>
        (0 until 16).minBy { j =>
          var acc = 0.0
          for (d <- 0 until 8) {
            val diff = v(s * 8 + d).toDouble - cb(s)(j)(d); acc += diff * diff
          }
          acc
        }
      }
      assert(got(r.getLong(0)) == expect, s"codes mismatch for ${r.getLong(0)}")
    }
    // codebook source vectors encode to themselves: vector j of the
    // codebook has distance 0 to code j in EVERY sub-space
    val srcIds = corpus.filter(col("vec_id") % 5 === 2)
      .orderBy(col("vec_id").asc).select("vec_id").limit(16)
      .as[Long].collect()
    srcIds.zipWithIndex.foreach { case (id, j) =>
      assert(got(id) == Seq.fill(8)(j), s"codebook vector $id must self-encode to $j")
    }
  }

  test("ADC equals the reconstruction distance (lookup-table identity)") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val cb = Pq.codebook(corpus, "vec_id", "embedding", 8, 16, 5, 2)
    val q = queryVec
    val lut = Pq.lookupTable(q, cb)
    val top = Pq.pqTopK(corpus, "vec_id", "embedding", q, k = 5)
      .collect()
    top.foreach { r =>
      val codes = r.getString(1).split(",").map(_.toInt)
      var expect = 0.0
      for (s <- 0 until 8) expect += lut(s)(codes(s))
      assert(math.abs(r.getDouble(2) - expect) == 0.0)
    }
  }

  test("recall: PQ top-20 finds most of the exact top-5") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = queryVec
    import spark.implicits._
    val exact = Ann.bruteForceTopK(corpus, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.pqTopK(corpus, "vec_id", "embedding", q, k = 20)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall collapsed: $recall (pq=$pq exact=$exact)")
  }

  test("plan shape: encode+rank is map + TakeOrdered, zero exchanges") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = queryVec
    val plan = Pq.pqTopK(corpus, "vec_id", "embedding", q, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"PQ scan must not shuffle:\n$plan")
  }

  test("persistable codes index answers queries without the float column") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") =!= 0)
    val cb = Pq.codebook(corpus, "vec_id", "embedding", 8, 16, 5, 2)
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString
    Pq.encodeAll(corpus, "vec_id", "embedding", cb)
      .write.mode("overwrite").parquet(dir)
    val q = queryVec
    val lut = Pq.lookupTable(q, cb)
    val fromIndex = spark.read.parquet(dir)
      .select(col("id").as("vec_id"), Pq.pq_adc(col("codes"), lut).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    val direct = Pq.pqTopK(corpus, "vec_id", "embedding", q, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(fromIndex == direct)
  }
}
