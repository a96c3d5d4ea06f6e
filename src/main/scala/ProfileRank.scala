import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, 32)
    val sf = "/root/testdata/sf0.1"
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"TIMING $n ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    val edges = t("derive+dedup+count") { val e = graft.graph.WebGraph.edges(spark, sf); println("edges="+e.count()); e }
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val eod = t("eod cache") { val x = edges.join(outdeg, "src").select(col("src"),col("dst"),col("od")).repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK); x.count(); x }
    val init = graft.graph.LinkRank.uniformInit(edges)
    val base = t("base") { init.join(outdeg.withColumnRenamed("src","id"), Seq("id"), "left")
      .select(col("id"), col("score"), col("od").isNull.as("dangling"), lit(false).as("trusted")) }
    var ranks = t("ckpt0") { base.repartition(col("id")).localCheckpoint() }
    val n = 20854.0
    for (i <- 1 to 3) {
      val d = t(s"dangling$i") { ranks.filter(col("dangling")).agg(coalesce(sum(col("score")),lit(0.0))).first().getDouble(0) }
      val contribs = eod.join(ranks.select(col("id"),col("score")), eod("src")===col("id"))
        .groupBy(col("dst")).agg(sum(col("score")/col("od")).as("contrib")).withColumnRenamed("dst","cid")
      ranks = t(s"iter$i") { ranks.drop("score").join(contribs, col("id")===col("cid"), "left")
        .select(col("id"),col("dangling"),col("trusted"),
          (lit(0.15/n) + lit(0.85)*(coalesce(col("contrib"),lit(0.0)) + lit(d/n))).as("score")).localCheckpoint() }
    }
    spark.stop()
  }
}
