package graft

/** Regression spec for the bench's one-file-per-split scan sizing
  * (`Bench.session`: maxPartitionBytes=2m, openCostInBytes=1m).
  *
  * Round-5 finding: the 4m/1m setting still packed 2-3 of the ~675k
  * bench-corpus files per split (87 scan tasks = 5.4 waves at 16 cores),
  * and the half-idle final wave alone cost the measured 4v16 scaling
  * ratio ~0.20 (0.701 vs 0.902 in back-to-back full runs). Spark closes
  * a split when currentBytes + nextFileSize exceeds the cap, with each
  * packed file contributing size + openCost to currentBytes — so 2m/1m
  * packs exactly one file per split iff fileSize > (2m - 1m) / 2 = 512k,
  * which the ~675k corpus files satisfy. This spec pins that arithmetic
  * against Spark's FilePartition packing with corpus-sized incompressible
  * files, so a Spark default change or a config typo can't silently
  * reintroduce wave quantization.
  */
class SplitSizingSpec extends SparkSpec {

  test("2m/1m split sizing yields exactly one scan partition per " +
    "corpus-sized (~700k) parquet file; the defaults pack files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    val files = 8
    // 4 rows x ~176k of snappy-incompressible payload per file (md5 hex
    // chains have no LZ matches for snappy to exploit), sized like the
    // real bench corpus files: 512k < size < 1m. 32 rows round-robin
    // into 8 partitions so no output partition (= file) is empty.
    spark.range(files * 4L)
      .selectExpr("id",
        "array_join(transform(sequence(1, 5500), " +
          "x -> md5(concat(cast(id as string), '_', cast(x as string)))), '') as text")
      .repartition(files)
      .write.mode("overwrite").parquet(dir)
    val written = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(written.length === files)
    assert(written.forall(f => f.length > 512 * 1024 && f.length < 1024 * 1024),
      written.map(_.length).mkString(","))

    def scanPartitions(maxPart: String, openCost: String): Int = {
      val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", maxPart)
        spark.conf.set("spark.sql.files.openCostInBytes", openCost)
        spark.read.parquet(dir).rdd.getNumPartitions
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
        spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
      }
    }

    // the bench setting: one file per split, no partial-wave quantization
    assert(scanPartitions("2m", "1m") === files)
    // the Spark defaults pack (what the bench must NOT do)
    assert(scanPartitions("128m", "4m") <= files / 2)
  }
}
