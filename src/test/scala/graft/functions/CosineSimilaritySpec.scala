package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("native expression is bit-identical to the UDF kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 200).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("a", "b")
    val rows = df.select(
      GraftFunctions.cosine(col("a"), col("b")).as("native"),
      graft.ml.Similarity.cosine(col("a"), col("b")).as("udf"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact
  }

  test("length mismatch folds over min length, like the kernel") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f, 5f), Seq(1f, 0f))).toDF("a", "b")
    val got = df.select(GraftFunctions.cosine(col("a"), col("b"))).collect()(0)
    // kernel over first 2 dims of a: cos((1,0),(1,0)) scaled by |a|_2dims
    val want = graft.ml.Similarity.cosineKernel(
      Array(1f, 0f, 5f), Array(1f, 0f))
    assert(got.getDouble(0) == want)
  }

  test("null array input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Option(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val got = df.select(GraftFunctions.cosine(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0))
  }

  test("participates in whole-stage codegen (no ScalaUDF in the plan)") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
    val plan = df.select(GraftFunctions.cosine(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("zero-norm side is cosine 0, not NaN, in all three implementations") {
    import spark.implicits._
    // NaN would sort ABOVE every real value in a top-k window and hijack
    // rank 1 (round-5 review); the defined value must agree across the
    // native expression (interpreted + codegen), the UDF reference, and
    // the mapPartitions kernel
    val cases = Seq(
      (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
      (Seq(1f, 2f, 3f), Seq(0f, 0f, 0f)),
      (Seq.empty[Float], Seq(1f, 2f)),
      (Seq(0f, 0f), Seq(0f, 0f)))
    val rows = cases.toDF("a", "b").select(
      GraftFunctions.cosine(col("a"), col("b")).as("native"),
      graft.ml.Similarity.cosine(col("a"), col("b")).as("udf"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 0.0, "native")
      assert(r.getDouble(1) == 0.0, "udf")
    }
    cases.foreach { case (a, b) =>
      assert(graft.ml.Similarity.cosineKernel(a.toArray, b.toArray) == 0.0)
    }
  }

  test("SQL registration: graft_cosine callable from spark.sql") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Seq(1f, 2f), Seq(1f, 2f))).toDF("a", "b").createOrReplaceTempView("cs")
    val got = spark.sql("SELECT graft_cosine(a, b) FROM cs").collect()(0)
    assert(math.abs(got.getDouble(0) - 1.0) < 1e-12)
  }
}
