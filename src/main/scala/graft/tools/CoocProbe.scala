package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Pipeline
object CoocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[cooc] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val m = Pipeline.mentions(spark, sfDir).select("doc_id", "pos", "mkey")
      .localCheckpoint(true)
    t("warm")(m.count())
    (1 to 2).foreach { r =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      t(s"collect_set fallback=128 (r$r)")(
        m.groupBy("doc_id", "pos")
          .agg(slice(array_sort(collect_set(col("mkey"))), 1, 64).as("ks"))
          .filter(size(col("ks")) >= 2).count())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
      t(s"collect_set fallback=1e8 (r$r)")(
        m.groupBy("doc_id", "pos")
          .agg(slice(array_sort(collect_set(col("mkey"))), 1, 64).as("ks"))
          .filter(size(col("ks")) >= 2).count())
    }
    spark.stop()
  }
}
