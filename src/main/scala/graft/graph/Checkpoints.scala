package graft.graph

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable stage execution with a per-partition lineage + metrics
  * checkpoint table — the engine's equivalent of the reference's
  * chunk checkpoint files (lore/events.py:397-431, SURVEY.md S7/E4).
  *
  * Layout under a warehouse dir:
  *   <wh>/<stage>/            stage output parquet
  *   <wh>/_checkpoints/       checkpoint table parquet (append-only)
  *
  * Checkpoint rows: (stage, partition_id, rows_out, status, updated_at).
  * A stage whose latest status is 'complete' and whose output exists is
  * loaded, not recomputed — a restarted job resumes mid-pipeline. In a
  * real deployment this table is an Iceberg table and the write is an
  * atomic commit; parquet-append is the sandbox stand-in (no Iceberg jars
  * in /opt/spark/jars).
  */
final class Checkpoints(spark: SparkSession, warehouse: String) {

  private val ckDir = s"$warehouse/_checkpoints"

  def checkpointTable(): DataFrame = {
    if (Files.exists(Paths.get(ckDir))) spark.read.parquet(ckDir)
    else spark.emptyDataFrame
  }

  private def isComplete(stage: String): Boolean = {
    Files.exists(Paths.get(ckDir)) &&
      Files.exists(Paths.get(s"$warehouse/$stage/_SUCCESS")) && {
        val t = spark.read.parquet(ckDir)
        !t.filter(col("stage") === stage && col("status") === "complete")
          .isEmpty
      }
  }

  private def record(stage: String, partCounts: DataFrame, status: String): Unit = {
    import spark.implicits._
    partCounts
      .select(
        lit(stage).as("stage"),
        col("partition_id").cast("int").as("partition_id"),
        col("rows_out").cast("long").as("rows_out"),
        lit(status).as("status"),
        current_timestamp().as("updated_at"))
      .write.mode(SaveMode.Append).parquet(ckDir)
  }

  /** Record an arbitrary metrics row (e.g. CC superstep convergence). */
  def recordMetric(stage: String, partitionId: Int, rowsOut: Long,
      status: String): Unit = {
    import spark.implicits._
    Seq((stage, partitionId, rowsOut, status))
      .toDF("stage", "partition_id", "rows_out", "status")
      .withColumn("updated_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(ckDir)
  }

  /** Run (or resume) a stage: if checkpointed complete, load its output;
    * otherwise compute, persist, and record per-partition lineage.
    */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    val out = s"$warehouse/$name"
    if (isComplete(name)) {
      spark.read.parquet(out)
    } else {
      compute.write.mode(SaveMode.Overwrite).parquet(out)
      val written = spark.read.parquet(out)
      // per-output-file lineage (one file per write task partition)
      val partCounts = written
        .groupBy(abs(hash(input_file_name())).as("partition_id"))
        .agg(count(lit(1)).as("rows_out"))
      record(name, partCounts, "complete")
      written
    }
  }
}
