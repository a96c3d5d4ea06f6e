object TimeQ43 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.text.TextQueries.q43Fingerprint(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(s"q43 run$i: ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
