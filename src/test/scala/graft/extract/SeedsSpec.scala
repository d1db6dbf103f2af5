package graft.extract

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeedsSpec extends SparkSpec {

  test("S4: reference-format seed JSON loads into the registry") {
    val dir = Files.createTempDirectory("seeds")
    Files.writeString(dir.resolve("characters.json"),
      """[{"id":"gandalf","canonical_name":"Gandalf",
        |"aliases":["Mithrandir"],"race":"Maia"},
        |{"id":"bilbo_baggins","canonical_name":"Bilbo Baggins",
        |"aliases":["Bilbo"]}]""".stripMargin)
    val seeds = Seeds.fromJson(spark,
      dir.resolve("characters.json").toString, "character")
    assert(seeds.map(_.id).toSet == Set("gandalf", "bilbo_baggins"))
    assert(seeds.find(_.id == "gandalf").get.aliases == Seq("Mithrandir"))
    val rows = Seeds.aliasRows(seeds)
    assert(rows.contains(("mithrandir", "gandalf", "character", "Gandalf")))
  }

  test("malformed seed rows: missing names dropped, empty aliases skipped (round-5 review)") {
    val dir = Files.createTempDirectory("seedsbad")
    // row without canonical_name (previously NPE'd in aliasRows), row
    // without id, and an empty-string alias (previously registered an
    // empty Aho-Corasick pattern firing a zero-width mention at every
    // text position)
    Files.writeString(dir.resolve("bad.json"),
      """[{"id":"x1","aliases":["ok-alias"]},
        |{"canonical_name":"NoId"},
        |{"id":"y","canonical_name":"Ypsilon","aliases":["", "  ", "Real"]}]"""
        .stripMargin)
    val seeds = Seeds.fromJson(spark, dir.resolve("bad.json").toString,
      "character")
    assert(seeds.map(_.id) == Seq("y"))
    val rows = Seeds.aliasRows(seeds)
    assert(rows.map(_._1).toSet == Set("ypsilon", "real"))
  }

  test("D10/S6: registry exports back to seed-JSON shape") {
    import spark.implicits._
    val registry = Seq(
      ("gandalf", "Gandalf", "character", Seq("Mithrandir")),
      ("rivendell", "Rivendell", "place", Seq.empty[String]))
      .toDF("cluster", "canonical_name", "entity_type", "aliases")
    val out = Files.createTempDirectory("seedout").toString
    Seeds.exportSeedJson(registry, out)
    val back = spark.read.json(s"$out/entity_type=character")
    val row = back.collect()(0)
    assert(row.getAs[String]("id") == "gandalf")
    assert(row.getSeq[String](row.fieldIndex("aliases")) == Seq("Mithrandir"))
  }
}
