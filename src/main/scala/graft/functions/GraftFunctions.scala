package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.CosineSimilarity

/** Column-API entry points for the graft native Catalyst expressions
  * (implementations live under org.apache.spark.sql.graft — see
  * [[org.apache.spark.sql.graft.CosineSimilarity]] for why).
  */
object GraftFunctions {

  /** Codegen'd double-precision cosine similarity of two float-array
    * columns; bit-identical arithmetic to `Similarity.cosine` but stays
    * inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity.asColumn(a, b)

  /** Register `graft_cosine` for spark.sql(...) use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_cosine requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
}
