package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    println("=== q21_quality (documents scan) ===")
    graft.SparkEntry.queries("q21_quality")(spark, sf).explain("formatted")
    println("=== q07_edges (fused pipeline) ===")
    graft.SparkEntry.queries("q07_edges")(spark, sf).explain("formatted")
    spark.stop()
  }
}
