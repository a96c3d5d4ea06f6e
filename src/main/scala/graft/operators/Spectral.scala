package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Caller-frame spectral engines: power-iteration PCA over any
  * (id, vector) frame (q205's machinery, the Glm.scala convention).
  */
object Spectral {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6)))

  /** Top principal component of the uncentered second-moment matrix by
    * `rounds` power iterations; returns one row per round with the
    * Rayleigh eigenvalue estimate and explained-variance share. `dim`
    * is the (fixed) vector dimensionality. See q205 for the plan
    * audit — the matvec never materializes d×d. */
  def pcaTopComponent(vecs: DataFrame, id: Column, vec: Column,
                      dim: Int, rounds: Int): DataFrame = {
    val spark = vecs.sparkSession
    val exploded = graft.Checkpoints.deferFree(
      vecs.select(id.as("vec_id"), vec.as("embedding"))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"), col("x").cast("double").as("x"))
        .localCheckpoint())
    val trace = exploded.agg(
      dsum(round(col("x") * col("x"), 6)).cast("double").as("trace"))
    val v0 = 1.0 / math.sqrt(dim.toDouble)
    var v = spark.range(dim).select(col("id").cast("int").as("j"),
      lit(math.rint(v0 * 1e6) / 1e6).as("v"))
    var out: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      val dots = exploded.join(broadcast(v), "j")
        .groupBy(col("vec_id"))
        .agg(dsum(round(col("x") * col("v"), 6)).cast("double").as("dot"))
      // checkpoint the matvec result: the Rayleigh row, the norm
      // broadcast, and the next round's v would otherwise each re-run
      // the two corpus-scale joins (the q151 union lesson)
      val y = graft.Checkpoints.deferFree(exploded.join(dots, "vec_id")
        .groupBy(col("j"))
        .agg(dsum(round(col("x") * col("dot"), 6)).cast("double").as("y"))
        .localCheckpoint())
      val lamNorm = y.join(broadcast(v), "j")
        .agg(dsum(round(col("v") * col("y"), 6)).cast("double").as("lambda"),
          dsum(round(col("y") * col("y"), 6)).cast("double").as("ynorm2"))
      out = out :+ lamNorm.crossJoin(broadcast(trace))
        .select(lit(r).as("round"),
          round(col("lambda"), 6).as("lambda"),
          round(col("lambda") / col("trace"), 6).as("explained_share"))
      v = y.crossJoin(broadcast(lamNorm))
        .select(col("j"), round(col("y") / sqrt(col("ynorm2")), 6).as("v"))
        .localCheckpoint()
    }
    graft.Checkpoints.deferFree(v)
    out.reduce(_ unionAll _).orderBy(col("round"))
  }
}
