package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{SmartTitle, TextNorm, TitleCase, Uuids}
import graft.operators.Fanout

/** ScalaCheck properties for the pure scalar functions (no Spark
  * session needed — these are the UDF bodies).
  */
object GraftProperties extends Properties("graft") {

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val sentence = Gen.listOf(word).map(_.mkString(" "))

  property("titleCase is idempotent") = forAll(sentence) { s =>
    val once = TitleCase.titleCase(s)
    TitleCase.titleCase(once) == once
  }

  property("titleCase preserves word count") = forAll(sentence) { s =>
    TitleCase.titleCase(s).split(" ", -1).length == s.split(" ", -1).length
  }

  property("smartTitle is idempotent") = forAll(sentence) { s =>
    val once = SmartTitle.smartTitle(s)
    SmartTitle.smartTitle(once) == once
  }

  property("nfkdFold is idempotent") = forAll(sentence) { s =>
    val once = TextNorm.nfkdFold(s)
    TextNorm.nfkdFold(once) == once
  }

  property("uuid5 is deterministic and well-formed") = forAll(word) { n =>
    val a = Uuids.uuid5(Uuids.NsDns, n)
    a == Uuids.uuid5(Uuids.NsDns, n) &&
      a.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
  }

  property("uuid5 namespace separates") = forAll(word) { n =>
    Uuids.uuid5(Uuids.NsDns, n) != Uuids.uuid5(Uuids.NsUrl, n)
  }

  property("guardedSplit yields trimmed, non-empty, distinct parts") =
    forAll(Gen.listOf(Gen.oneOf(word, Gen.const("a, Jr"),
      Gen.const(" x & y "))).map(_.mkString("; "))) { s =>
      val parts = Fanout.guardedSplit(s)
      parts.forall(p => p.nonEmpty && p == p.trim) &&
        parts.distinct == parts
    }

  // reference string-shingle set (the semantics HashedShingles fuses)
  private def stringShingles(s: String, k: Int): Set[String] = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  private def hashed(s: String, k: Int): Seq[Long] = {
    val arr = graft.functions.HashedShingles.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
    (0 until arr.numElements()).map(arr.getLong)
  }

  property("hashedShingles cardinality matches the string-shingle set") =
    forAll(sentence, Gen.choose(1, 5)) { (s, k) =>
      hashed(s, k).length == stringShingles(s, k).size
    }

  property("hashedShingles Jaccard equals string-shingle Jaccard") =
    forAll(sentence, sentence, Gen.choose(1, 4)) { (a, b, k) =>
      val (ha, hb) = (hashed(a, k).toSet, hashed(b, k).toSet)
      val (sa, sb) = (stringShingles(a, k), stringShingles(b, k))
      val hj = ha.intersect(hb).size.toDouble / ha.union(hb).size
      val sj = sa.intersect(sb).size.toDouble / sa.union(sb).size
      hj == sj
    }

  property("hashedShingles output is sorted strictly increasing") =
    forAll(sentence, Gen.choose(1, 5)) { (s, k) =>
      val h = hashed(s, k)
      h.zip(h.drop(1)).forall { case (x, y) => x < y } || h.length <= 1
    }

  // arbitrary Unicode strings incl. supplementary-plane code points
  // (built from code points, so no lone surrogates — matching what a
  // valid UTF-8 column can hold)
  private val unicode: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.choose(0xa0, 0x2fff),
    1 -> Gen.choose(0xe000, 0xfffd),
    2 -> Gen.choose(0x10000, 0x10ffff)))
    .map(_.map(Character.toChars(_).mkString).mkString)

  property("TopK.Utf8Ordering equals UTF8String binary comparison") =
    forAll(unicode, unicode) { (a, b) =>
      val mine = graft.operators.TopK.Utf8Ordering.compare(a, b)
      val spark = org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      Integer.signum(mine) == Integer.signum(spark)
    }
}
