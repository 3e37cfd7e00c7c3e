package graft
object QTime {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").appName("qtime")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $q%-28s $sec%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
