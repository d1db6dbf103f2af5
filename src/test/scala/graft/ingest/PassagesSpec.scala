package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PassagesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("pos", IntegerType),
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

  test("validate: identical null fields compare equal; drops still fail (round-5 review)") {
    // a media span with null text on BOTH sides is a match — three-valued
    // null logic must not fail it; a row missing on one side must fail
    val both = Seq(
      Row("d1", 0, "text", "hello", null, 0),
      Row("d1", 1, "media", null, "img://1", 5),
      Row("d2", 0, null, null, null, null))
    val ok = Passages.validate(df(both), df(both))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ok("d1") && ok("d2"))

    // doc d3 present only in passages (phantom): its doc must fail even
    // though every field of the missing source side is null
    val withPhantom = both :+ Row("d3", 0, null, null, null, null)
    val ok2 = Passages.validate(df(withPhantom), df(both))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ok2("d1") && ok2("d2") && !ok2("d3"))

    // field mismatch still fails
    val changed = Seq(
      Row("d1", 0, "text", "HELLO", null, 0),
      Row("d1", 1, "media", null, "img://1", 5),
      Row("d2", 0, null, null, null, null))
    val ok3 = Passages.validate(df(changed), df(both))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!ok3("d1") && ok3("d2"))
  }

  test("validate: duplicate (doc_id, pos) keys keep pairwise-join semantics") {
    // the union+aggregate form must reproduce the old full-outer join's
    // behavior on duplicate keys: every p-row compared against every
    // s-row — ok iff both sides are uniform AND equal
    val dupEq = Seq(
      Row("d1", 0, "text", "same", null, 0),
      Row("d1", 0, "text", "same", null, 0))
    val okEq = Passages.validate(df(dupEq), df(dupEq))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(okEq("d1")) // identical duplicates on both sides: all pairs equal

    val dupMixed = Seq(
      Row("d1", 0, "text", "one", null, 0),
      Row("d1", 0, "text", "two", null, 0))
    val single = Seq(Row("d1", 0, "text", "one", null, 0))
    // a non-uniform side fails (some pair differs), in every arrangement
    assert(!Passages.validate(df(dupMixed), df(dupMixed))
      .collect().head.getBoolean(1))
    assert(!Passages.validate(df(dupMixed), df(single))
      .collect().head.getBoolean(1))
    assert(!Passages.validate(df(single), df(dupMixed))
      .collect().head.getBoolean(1))
    // uniform duplicates against a single equal row: all pairs equal
    val singleSame = Seq(Row("d1", 0, "text", "same", null, 0))
    assert(Passages.validate(df(dupEq), df(singleSame))
      .collect().head.getBoolean(1))
  }
}
