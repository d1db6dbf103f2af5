package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Diagnostic main: print the formatted physical plan of named queries
  * (the per-round plan-audit tool). Usage:
  *   runMain graft.tools.ExplainAudit <sfDir> <query> [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
