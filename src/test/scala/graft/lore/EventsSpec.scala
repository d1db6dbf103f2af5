package graft.lore

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  test("pattern extraction: NAME verb (the)? OBJECT (lore/events.py:621-646)") {
    val out = Events.extract("Gandalf killed the Balrog.")
    assert(out.contains(("Gandalf", "killed", "Balrog")))
  }

  test("prepositional patient is kept verbatim, as the reference does") {
    val out = Events.extract("Bilbo traveled to Erebor.")
    assert(out.contains(("Bilbo", "traveled", "to Erebor")))
  }

  test("normalized-key dedup (E3): stem + article strip") {
    val out = Events.extract("Thorin found the Arkenstone. Thorin found Arkenstone.")
    assert(out.count(_._2 == "found") == 1)
  }

  test("year/era extraction: all three reference patterns (E6)") {
    assert(Events.extractYear("in the year 2941 of the Third Age") ==
      ((Some(2941), Some("THIRD_AGE"))))
    assert(Events.extractYear("First Age 466 was dark") ==
      ((Some(466), Some("FIRST_AGE"))))
    assert(Events.extractYear("T.A. 3019") == ((Some(3019), Some("THIRD_AGE"))))
    assert(Events.extractYear("no dates here") == ((None, None)))
  }

  test("ordering inference: era then year, tie years skipped (E9)") {
    import spark.implicits._
    val events = Seq(
      ("d1", 0, "e1", 2941, "THIRD_AGE"),
      ("d1", 1, "e2", 2950, "THIRD_AGE"),
      ("d1", 2, "e3", 2950, "THIRD_AGE"), // tie with e2 -> skipped
      ("d1", 3, "e0", 400, "FIRST_AGE"))
      .toDF("doc_id", "pos", "event_id", "year", "era")
    val rels = Events.inferOrdering(events)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getDouble(4)))
      .toSet
    assert(rels == Set(
      ("e0", "e1", 0.95), // different eras
      ("e1", "e2", 0.9))) // same era, different years; e2~e3 skipped
  }
}
