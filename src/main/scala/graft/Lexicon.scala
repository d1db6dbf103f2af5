package graft

/** Shared deterministic lexicons.
  *
  * Two families live here:
  *
  *  1. Constants ported from the reference's deterministic extraction paths
  *     (these ARE the spec — see /root/reference citations on each member).
  *  2. The synthetic-corpus lexicon used by [[graft.ingest.DocsSynth]] to
  *     derive the `docs(doc_id, spans)` table from the driver's TPC-H-ish
  *     parquet. Both the Spark synthesis and the DuckDB oracle SQL are
  *     generated from the same values, so they can never drift.
  */
object Lexicon {

  // ---------------------------------------------------------------------
  // Synthetic corpus lexicon (single-token names by construction so the
  // capitalized-span detector and the SQL oracles agree exactly).
  // ---------------------------------------------------------------------

  /** 20 character names; canonical id = lowercase. */
  val Chars: IndexedSeq[String] = Vector(
    "Gandalf", "Bilbo", "Thorin", "Frodo", "Aragorn",
    "Legolas", "Gimli", "Boromir", "Samwise", "Meriadoc",
    "Peregrin", "Elrond", "Galadriel", "Saruman", "Gollum",
    "Bard", "Beorn", "Smaug", "Radagast", "Balin")

  /** One alias per character (parallel to [[Chars]]); single tokens chosen
    * to avoid (a) fuzzy collisions at the 0.85/0.90 thresholds and (b)
    * world-bible keyword-prefix hits (e.g. "Bowman" would match \bbow) —
    * both guarded by unit tests + the driver oracle compare.
    */
  val CharAliases: IndexedSeq[String] = Vector(
    "Mithrandir", "Burglar", "Oakenshield", "Underhill", "Strider",
    "Greenleaf", "Lockbearer", "Highwarden", "Gardener", "Brandybuck",
    "Took", "Halfelven", "Fairqueen", "Whitehand", "Stinker",
    "Marksman", "Skinchanger", "Firedrake", "Brownrobe", "Stonefoot")

  /** 12 place names; canonical id = lowercase. */
  val Places: IndexedSeq[String] = Vector(
    "Rivendell", "Hobbiton", "Erebor", "Gondor", "Moria", "Mirkwood",
    "Rohan", "Isengard", "Esgaroth", "Bree", "Lorien", "Dale")

  /** Birth-era names planted by m=20 templates (indexed by s % 2).
    * {Second, Third} chosen so the era phrase never starts with a
    * NonNames token ("First" is in the capitalized-span stoplist, which
    * would truncate the heuristic mention to just "Age").
    */
  val BirthEras: IndexedSeq[String] = Vector("Second", "Third")

  /** Death-era names for m=21 (indexed by s % 2); always one age after
    * the matching birth era so every character's lifespan is consistent
    * corpus-wide.
    */
  val DeathEras: IndexedSeq[String] = Vector("Third", "Fourth")

  /** People groups planted by m=25 culture templates (indexed by p % 6);
    * surface forms match the reference's cultures keyword groups
    * (worldbible/extractor.py:306-313).
    */
  val Peoples: IndexedSeq[String] = Vector(
    "hobbits", "elves", "dwarves", "men", "orcs", "wizards")

  /** Planted verb phrases: (surface phrase, predicate, objKind).
    * objKind: 0 = character object, 1 = place object.
    * Predicates follow the reference lexicon
    * (extract/relationships.py:24-86): spoke->SPOKE_WITH (lemma speak),
    * traveled->TRAVELED_TO, fought->FOUGHT, met->MET, helped->HELPED,
    * killed->KILLED, visited->VISITED, entered->ENTERED.
    */
  val Verbs: IndexedSeq[(String, String, Int)] = Vector(
    ("spoke to", "SPOKE_WITH", 0),
    ("traveled to", "TRAVELED_TO", 1),
    ("fought", "FOUGHT", 0),
    ("met", "MET", 0),
    ("helped", "HELPED", 0),
    ("killed", "KILLED", 0),
    ("visited", "VISITED", 1),
    ("entered", "ENTERED", 1))

  // ---------------------------------------------------------------------
  // Reference constants (ported verbatim — file:line cited per member)
  // ---------------------------------------------------------------------

  /** Verb (lemma AND surface forms) -> RelationshipType.
    * Reference keeps lemmas only (extract/relationships.py:24-86) and relies
    * on spaCy lemmatization; we carry surface forms explicitly (SURVEY.md §5
    * stale-test note: tests/test_relationships.py:150-160 expects surface
    * forms too).
    */
  val VerbToRelationship: Map[String, String] = {
    // (lemma, surfaces..., predicate)
    val rows: Seq[(Seq[String], String)] = Seq(
      (Seq("say", "said", "says", "saying"), "SPOKE_TO"),
      (Seq("ask", "asked", "asks"), "SPOKE_TO"),
      (Seq("tell", "told", "tells"), "SPOKE_TO"),
      (Seq("answer", "answered", "answers"), "SPOKE_TO"),
      (Seq("reply", "replied", "replies"), "SPOKE_TO"),
      (Seq("speak", "spoke", "speaks", "spoken"), "SPOKE_WITH"),
      (Seq("talk", "talked", "talks"), "SPOKE_WITH"),
      (Seq("call", "called", "calls"), "SPOKE_TO"),
      (Seq("cry", "cried", "cries"), "SPOKE_TO"),
      (Seq("shout", "shouted", "shouts"), "SPOKE_TO"),
      (Seq("whisper", "whispered", "whispers"), "SPOKE_TO"),
      (Seq("go", "went", "goes", "gone"), "TRAVELED_TO"),
      (Seq("travel", "traveled", "travels", "travelled"), "TRAVELED_TO"),
      (Seq("come", "came", "comes"), "TRAVELED_TO"),
      (Seq("arrive", "arrived", "arrives"), "TRAVELED_TO"),
      (Seq("reach", "reached", "reaches"), "TRAVELED_TO"),
      (Seq("enter", "entered", "enters"), "ENTERED"),
      (Seq("leave", "left", "leaves"), "LEFT"),
      (Seq("flee", "fled", "flees"), "LEFT"),
      (Seq("escape", "escaped", "escapes"), "LEFT"),
      (Seq("follow", "followed", "follows"), "TRAVELED_WITH"),
      (Seq("accompany", "accompanied", "accompanies"), "TRAVELED_WITH"),
      (Seq("fight", "fought", "fights"), "FOUGHT"),
      (Seq("attack", "attacked", "attacks"), "FOUGHT_AGAINST"),
      (Seq("kill", "killed", "kills"), "KILLED"),
      (Seq("slay", "slew", "slays", "slain"), "KILLED"),
      (Seq("defeat", "defeated", "defeats"), "FOUGHT_AGAINST"),
      (Seq("capture", "captured", "captures"), "CAPTURED"),
      (Seq("free", "freed", "frees"), "FREED"),
      (Seq("give", "gave", "gives", "given"), "GAVE"),
      (Seq("receive", "received", "receives"), "RECEIVED"),
      (Seq("take", "took", "takes", "taken"), "POSSESSES"),
      (Seq("find", "found", "finds"), "FOUND"),
      (Seq("lose", "lost", "loses"), "LOST"),
      (Seq("steal", "stole", "steals", "stolen"), "STOLE"),
      (Seq("use", "used", "uses"), "USED"),
      (Seq("carry", "carried", "carries"), "POSSESSES"),
      (Seq("wear", "wore", "wears", "worn"), "POSSESSES"),
      (Seq("wield", "wielded", "wields"), "POSSESSES"),
      (Seq("meet", "met", "meets"), "MET"),
      (Seq("join", "joined", "joins"), "ALLIED_WITH"),
      (Seq("help", "helped", "helps"), "HELPED"),
      (Seq("serve", "served", "serves"), "SERVES"),
      (Seq("lead", "led", "leads"), "LEADS"),
      (Seq("betray", "betrayed", "betrays"), "BETRAYED"),
      (Seq("live", "lived", "lives"), "LIVES_IN"),
      (Seq("dwell", "dwelt", "dwells", "dwelled"), "LIVES_IN"),
      (Seq("visit", "visited", "visits"), "VISITED"),
      (Seq("rule", "ruled", "rules"), "RULES"),
      (Seq("guard", "guarded", "guards"), "GUARDS"))
    rows.flatMap { case (forms, pred) => forms.map(_ -> pred) }.toMap
  }

  /** The 40-word stoplist of capitalized-but-not-name words.
    * Reference: voice/dialogue.py:279-298 (`non_names`). */
  val NonNames: Set[String] = Set(
    "he", "she", "it", "they", "we", "i", "you",
    "him", "her", "them", "us", "me",
    "the", "a", "an", "this", "that", "these", "those",
    "but", "and", "or", "then", "so", "yet", "for",
    "to", "from", "with", "at", "by", "in", "on", "of", "after", "before",
    "there", "here", "where", "when", "what", "how", "why",
    "now", "just", "still", "even", "also",
    "one", "all", "some", "any", "no", "not", "only",
    "old", "young", "little", "other", "first", "last")

  /** Speech-attribution verbs. Reference: voice/dialogue.py:16-76. */
  val SpeechVerbs: Seq[String] = Seq(
    "said", "says", "say", "saying",
    "asked", "asks", "ask", "asking",
    "replied", "replies", "reply", "replying",
    "answered", "answers", "answer", "answering",
    "whispered", "whispers", "whisper",
    "shouted", "shouts", "shout",
    "cried", "cries", "cry",
    "called", "calls", "call",
    "yelled", "yells", "yell",
    "screamed", "screams", "scream",
    "muttered", "mutters", "mutter",
    "murmured", "murmurs", "murmur",
    "growled", "growls", "growl",
    "hissed", "hisses", "hiss",
    "snarled", "snarls", "snarl",
    "snapped", "snaps", "snap",
    "groaned", "groans", "groan",
    "moaned", "moans", "moan",
    "sighed", "sighs", "sigh",
    "laughed", "laughs", "laugh",
    "chuckled", "chuckles", "chuckle",
    "giggled", "giggles", "giggle",
    "sobbed", "sobs", "sob",
    "wailed", "wails", "wail",
    "declared", "declares", "declare",
    "announced", "announces", "announce",
    "proclaimed", "proclaims", "proclaim",
    "exclaimed", "exclaims", "exclaim",
    "stated", "states", "state",
    "inquired", "inquires", "inquire",
    "queried", "queries", "query",
    "demanded", "demands", "demand",
    "wondered", "wonders", "wonder",
    "begged", "begs", "beg",
    "pleaded", "pleads", "plead",
    "urged", "urges", "urge",
    "insisted", "insists", "insist",
    "suggested", "suggests", "suggest",
    "proposed", "proposes", "propose",
    "explained", "explains", "explain",
    "told", "tells", "tell",
    "informed", "informs", "inform",
    "added", "adds", "add",
    "continued", "continues", "continue",
    "went on", "spake", "quoth", "cried out")

  /** Event verbs. Reference: lore/events.py:260-268. */
  val EventVerbs: Seq[String] = Seq(
    "found", "lost", "took", "gave", "stole", "received",
    "killed", "died", "born", "married", "met",
    "created", "forged", "destroyed", "broke",
    "traveled", "arrived", "left", "fled", "returned",
    "fought", "won", "defeated", "conquered",
    "said", "told", "revealed", "discovered", "learned",
    "became", "transformed", "awakened")

  /** Voice-profile archaisms (profile.py:110-116 — the 34-word voice list;
    * distinct from the style ARCHAISMS below). */
  val VoiceArchaisms: Seq[String] = Seq(
    "thee", "thou", "thy", "thine", "ye", "hath", "doth", "art", "wast",
    "wherefore", "hither", "thither", "whither", "hence", "thence",
    "ere", "nay", "aye", "yea", "behold", "lo", "alas", "forsooth",
    "methinks", "mayhap", "perchance", "betwixt", "amongst", "whilst",
    "verily", "hark", "hearken", "tarry", "prithee")

  /** Style/fingerprint archaism lexicon (metrics.py:33-41, 47 words). */
  val StyleArchaisms: Seq[String] = Seq(
    "thee", "thou", "thy", "thine", "ye", "hath", "doth", "art", "wast", "wert",
    "wherefore", "hither", "thither", "whither", "hence", "thence", "whence",
    "ere", "nay", "aye", "yea", "behold", "lo", "alas", "forsooth", "prithee",
    "methinks", "mayhap", "perchance", "betwixt", "amongst", "whilst", "oft",
    "twas", "tis", "twere", "twould", "neath", "oer", "eer",
    "verily", "hark", "hearken", "tarry", "smite", "smote", "smitten",
    "slew", "slain", "wrought", "begat", "begotten", "dwelt", "spake")

  /** Voice-profile top-word stoplist (profile.py:182-186). */
  val VoiceStopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "could",
    "should", "may", "might", "must", "shall", "can", "that", "this",
    "it", "its", "as", "if", "not", "no", "so", "up", "out", "about")

  /** First/second-person markers + contraction patterns
    * (profile.py:106-108). */
  val FirstPersonWords: Seq[String] = Seq(
    "i", "me", "my", "mine", "myself", "i'm", "i've", "i'll", "i'd")
  val SecondPersonWords: Seq[String] = Seq(
    "you", "your", "yours", "yourself", "you're", "you've", "you'll", "you'd")
  val ContractionPatterns: Seq[String] = Seq(
    "n't", "'s", "'re", "'ve", "'ll", "'d", "'m")

  /** Abbreviations protected during sentence splitting.
    * Reference: ingest/splitter.py:149-153. */
  val Abbreviations: Seq[String] = Seq(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "vs", "etc",
    "i.e", "e.g", "cf", "al", "St", "Mt", "Ft")

  /** Place-type keyword indicators. Reference: extract/resolver.py:241-246. */
  val PlaceIndicators: Seq[String] = Seq(
    "mountain", "forest", "river", "lake", "sea", "land",
    "realm", "kingdom", "city", "tower", "hall", "gate",
    "pass", "valley", "plain", "wood", "dale", "shire")

  /** Object-type keyword indicators. Reference: extract/resolver.py:251-254. */
  val ObjectIndicators: Seq[String] = Seq(
    "ring", "sword", "staff", "jewel", "stone", "gem",
    "crown", "armor", "helm", "blade", "bow", "arrow")

  // ---------------------------------------------------------------------
  // SQL-literal helpers (DuckDB oracle generation)
  // ---------------------------------------------------------------------

  /** Render a Scala string sequence as a DuckDB list literal. */
  def sqlList(xs: Seq[String]): String =
    xs.map(s => "'" + s.replace("'", "''") + "'").mkString("[", ", ", "]")

  /** DuckDB expression selecting element `idxExpr` (0-based) of `xs`. */
  def sqlElem(xs: Seq[String], idxExpr: String): String =
    s"(${sqlList(xs)})[CAST(($idxExpr) AS INT) + 1]"
}
