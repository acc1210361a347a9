package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TitleCaseSpec extends AnyFunSuite {
  import TitleCase.titleCase

  test("capitalizes words, lowercases interior small words") {
    assert(titleCase("the best of the rest") == "The Best of the Rest")
  }

  test("first and last words always capitalize") {
    assert(titleCase("of mice and men of") == "Of Mice and Men Of")
  }

  test("roman numerals uppercase") {
    assert(titleCase("symphony no 9 part iii") == "Symphony No 9 Part III")
  }

  test("internal capitals are preserved (McCartney guard)") {
    assert(titleCase("paul McCartney live") == "Paul McCartney Live")
  }

  test("hyphenated parts cased independently") {
    assert(titleCase("twenty-one pilots") == "Twenty-One Pilots")
  }

  test("force-upper acronyms") {
    assert(titleCase("the ep collection") == "The EP Collection")
  }

  test("contractions keep apostrophes") {
    assert(titleCase("don't stop believin'") == "Don't Stop Believin'")
  }

  test("idempotent: applying twice equals once (tm_titlecase.py:315-321)") {
    val samples = Seq("the best of the rest", "symphony no 9 part iii",
      "don't stop", "twenty-one pilots", "MIXED case STRING here")
    samples.foreach { s =>
      val once = titleCase(s)
      assert(titleCase(once) == once, s"not idempotent on: $s")
    }
  }

  test("null and empty are safe") {
    assert(titleCase(null) == null)
    assert(titleCase("") == "")
  }
}

class SmartTitleSpec extends AnyFunSuite {
  import SmartTitle.smartTitle

  test("Mc/Mac/Fitz prefixes recapitalize") {
    assert(smartTitle("paul mccartney") == "Paul McCartney")
    assert(smartTitle("shane macgowan") == "Shane MacGowan")
    assert(smartTitle("ella fitzgerald") == "Ella FitzGerald")
  }

  test("O' prefix") {
    assert(smartTitle("sinead o'connor") == "Sinead O'Connor")
  }

  test("nobiliary particles lowercase when not leading") {
    assert(smartTitle("ludwig van beethoven") == "Ludwig van Beethoven")
    assert(smartTitle("van morrison") == "Van Morrison")
  }

  test("plain names word-capitalize") {
    assert(smartTitle("miles davis") == "Miles Davis")
  }
}

class UuidsSpec extends AnyFunSuite {

  test("uuid5 matches RFC 4122 reference vector") {
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, 'python.org')
    assert(Uuids.uuid5(Uuids.NsDns, "python.org")
      == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("uuid5 is deterministic and name-sensitive") {
    assert(Uuids.uuid5(Uuids.NsDns, "x") == Uuids.uuid5(Uuids.NsDns, "x"))
    assert(Uuids.uuid5(Uuids.NsDns, "x") != Uuids.uuid5(Uuids.NsDns, "y"))
    assert(Uuids.uuid5(Uuids.NsDns, "x") != Uuids.uuid5(Uuids.NsUrl, "x"))
  }

  test("uuid5 sets version 5 and RFC variant bits") {
    val u = Uuids.uuid5(Uuids.NsDns, "anything")
    assert(u.charAt(14) == '5')
    assert("89ab".contains(u.charAt(19)))
  }

  test("uuid7 sets version 7, RFC variant, and time-orders") {
    val a = Uuids.uuid7()
    Thread.sleep(2)
    val b = Uuids.uuid7()
    assert(a.charAt(14) == '7' && b.charAt(14) == '7')
    assert("89ab".contains(a.charAt(19)))
    assert(Uuids.isUuid7(a))
    // 48-bit millis prefix is lexicographically monotonic
    assert(a.substring(0, 13) <= b.substring(0, 13))
  }
}

class TextNormSpec extends AnyFunSuite {

  test("nfkdFold strips diacritics and collapses whitespace") {
    assert(TextNorm.nfkdFold("Béla  Bartók") == "Bela Bartok")
    assert(TextNorm.nfkdFold("ﬁne") == "fine") // NFKD ligature fold
    assert(TextNorm.nfkdFold(null) == null)
  }
}

class ContributorsSpec extends AnyFunSuite {

  test("involved entries split on ' - '; bare hyphen needs commas both sides") {
    assert(Contributors.splitInvolvedEntries("A, R1 - B, R2")
      == Seq("A, R1", "B, R2"))
    assert(Contributors.splitInvolvedEntries("Jean-Luc, Producer")
      == Seq("Jean-Luc, Producer"))
    assert(Contributors.splitInvolvedEntries("A, R1-B, R2")
      == Seq("A, R1", "B, R2")) // comma on both sides of the hyphen
    assert(Contributors.splitInvolvedEntries(null) == Seq.empty)
    assert(Contributors.splitInvolvedEntries("  ") == Seq.empty)
  }

  test("peopleForRoles matches casefolded space-free keys, dedupes") {
    val s = "Paul, Main Artist - PAUL, MainArtist - Ringo, Producer"
    assert(Contributors.peopleForRoles(s, Set("mainartist")) == Seq("Paul"))
    assert(Contributors.peopleForRoles(s, Set("producer")) == Seq("Ringo"))
    // entries without a role token are skipped
    assert(Contributors.peopleForRoles("Solo", Set("mainartist")) == Seq.empty)
  }

  test("comma guard: thousands groups and generational suffixes hold") {
    val d = Map.empty[String, String]
    assert(Contributors.normalizeCell(d, "Smith, Jr") == "Smith, Jr")
    assert(Contributors.normalizeCell(d, "10,000 Maniacs") == "10,000 Maniacs")
    assert(Contributors.normalizeCell(d, "smith, jones")
      == "Smith\\\\Jones")
  }

  test("dictionary stages: whole-cell beats split; & is conservative") {
    val d = Map("crosby, stills & nash" -> "Crosby, Stills & Nash",
      "crosby" -> "Crosby", "stills" -> "Stills", "nash" -> "Nash")
    // whole-part hit wins before any comma/& splitting
    assert(Contributors.normalizeCell(d, "Crosby, Stills & Nash")
      == "Crosby, Stills & Nash")
    // without the whole-cell entry the & splits (all sides resolve)
    val d2 = d - "crosby, stills & nash"
    assert(Contributors.normalizeCell(d2, "stills & nash")
      == "Stills\\\\Nash")
  }

  test("empty and null cells stay null") {
    assert(Contributors.normalizeCell(Map.empty, null) == null)
    assert(Contributors.normalizeCell(Map.empty, "") == null)
  }
}
