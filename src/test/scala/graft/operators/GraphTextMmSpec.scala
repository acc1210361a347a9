package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels two chains and respects min-id") {
    // components: {1,2,3,4} (chain) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val cc = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("componentStats sizes and sorted member lists") {
    val edges = Seq((5L, 3L), (3L, 9L)).toDF("src", "dst")
    val s = GraphOps.componentStats(GraphOps.connectedComponents(edges))
      .collect().head
    assert(s.getLong(0) == 3L && s.getLong(1) == 3L)
    assert(s.getString(2) == "3 | 5 | 9")
  }

  test("star-contraction CC agrees with propagation on all graph shapes") {
    import scala.util.Random
    // long chain (diameter 60 — the propagation-unfriendly case),
    // a clique, a star, isolated pairs, and a random graph
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val clique = for (i <- 100L to 107L; j <- (i + 1) to 107L) yield (i, j)
    val star = (201L to 209L).map(i => (200L, i))
    val rnd = new Random(42)
    val random = Seq.fill(120)((300L + rnd.nextInt(60),
      300L + rnd.nextInt(60))).filter(p => p._1 != p._2)
    val edges = (chain ++ clique ++ star ++ random).toDF("src", "dst")
    // propagation needs O(diameter) ≈ 60 rounds here; the star variant
    // stays within its default cap — the asymmetry this test exists for
    val prop = GraphOps.connectedComponents(edges, maxIter = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val starCc = GraphOps.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starCc == prop)
    assert(starCc(59L) == 0L) // the chain's far end carries the min label
    // the non-converged escape hatch still returns ONE row per node
    // (mid-run multi-parent edges must not fan the label join out)
    val partial = GraphOps.connectedComponentsStar(edges, maxIter = 1,
      failOnMaxIter = false).collect()
    assert(partial.map(_.getLong(0)).distinct.length == partial.length)
  }

  test("pageRank: uniform on regular graphs, center-heavy on stars") {
    // triangle, equal weights: the uniform vector is (up to the 6-dp
    // per-round rounding) a fixed point — all ranks equal
    val tri = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "weight")
    val triPr = GraphOps.pageRank(tri).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(triPr.size == 3)
    assert(triPr.values.toSet.size == 1, s"regular graph not uniform: $triPr")
    assert(math.abs(triPr.values.sum - 1.0) < 1e-4)
    // star: the center accumulates every leaf's full out-weight
    val star = (2L to 6L).map(i => (1L, i, 1L)).toDF("src", "dst", "weight")
    val starPr = GraphOps.pageRank(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(starPr(1L) > starPr(2L) * 2)
    assert((3L to 6L).forall(i => starPr(i) == starPr(2L)))
    assert(math.abs(starPr.values.sum - 1.0) < 1e-4)
  }

  test("pageRank matches the micro-rounded recurrence exactly, " +
      "independent of partitioning") {
    import scala.util.Random
    val rnd = new Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong,
        rnd.nextInt(12).toLong, (1 + rnd.nextInt(4)).toLong))
      .filter(e => e._1 != e._2)
      .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
      .distinct
    // single-threaded reference: the same recurrence on Scala Maps —
    // micro-rounded contributions (order-free by construction), 6-dp
    // per-round ranks, 5 rounds, damping 0.85
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val ow = sym.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val n = ow.size
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = ow.keys.map(_ -> r6(1.0 / n)).toMap
    for (_ <- 1 to 5) {
      val sums = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) =>
          math.round(pr(u) * w / ow(u) * 1e6) }.sum
      }
      pr = sums.map { case (v, sm) =>
        v -> r6((1.0 - 0.85) / n + 0.85 * (sm.toDouble / 1e6)) }
    }
    val df = edges.toDF("src", "dst", "weight")
    val got = GraphOps.pageRank(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == pr)
    // shuffling the physical layout must not perturb a single bit —
    // the integer-micro contributions make the sums order-free
    val got7 = GraphOps.pageRank(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got7 == pr)
  }

  test("coOccurrenceEdges counts undirected weights with src<dst") {
    val df = Seq((Option("g1"), 2L), (Option("g1"), 1L),
      (Option("g2"), 1L), (Option("g2"), 2L), (Option("g2"), 2L),
      // null group: its members never co-occur (join-on-g contract)
      (Option.empty[String], 5L), (Option.empty[String], 6L))
      .toDF("g", "m")
    val e = GraphOps.coOccurrenceEdges(df, "g", "m").collect()
    assert(e.length == 1)
    assert((e.head.getLong(0), e.head.getLong(1), e.head.getLong(2))
      == (1L, 2L, 2L))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langIdHeuristic votes by stopwords, und on no evidence") {
    val r = Seq(
      "the cat is on the mat and it is fine",
      "der hund ist nicht die katze und das haus",
      "le chat est sur la table et il ne dort pas",
      "xyzzy plugh 42").toDF("t")
      .select(TextAnalysis.langIdHeuristic(col("t"))).collect()
      .map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("subwordTokens splits alnum runs and counts punct individually") {
    val r = Seq("Customer#01 x-y").toDF("t")
      .select(TextAnalysis.subwordTokens(col("t"))).collect().head
      .getSeq[String](0)
    assert(r == Seq("Customer", "#", "01", "x", "-", "y"))
  }

  test("rollingFingerprint is an ordered fold (order-sensitive, exact)") {
    val r = Seq(("ab", "ba"), ("ab", "ab")).toDF("x", "y")
      .select(TextAnalysis.rollingFingerprint(col("x"))
          === TextAnalysis.rollingFingerprint(col("y")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r == Seq(false, true))
    // manual: 'a'=97,'b'=98 → (97*31+98) = 3105
    val v = Seq("ab").toDF("t")
      .select(TextAnalysis.rollingFingerprint(col("t"))).collect().head
      .getLong(0)
    assert(v == 97L * 31 + 98)
  }

  test("bpePairCounts: vocabulary-weighted adjacent pairs by hand") {
    import spark.implicits._
    val docs = Seq((1L, "ab AB abc"), (2L, "xy")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // vocab after lowering: ab×2, abc×1, xy×1 → pairs ab:2+1, bc:1, xy:1
    assert(got == Seq(("ab", 3L), ("bc", 1L), ("xy", 1L)))
    // topN truncates on the (n desc, pair) total order
    val top1 = TextAnalysis.bpePairCounts(docs, "text", topN = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("ab"))
  }

  test("bpeTrain: the Sennrich corpus learns its merge sequence by hand") {
    import spark.implicits._
    // the classic fixture: low×3 lower×2 newest×4 widest×1
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // hand-derived greedy sequence (count desc, pair asc tie-break):
    //  1: (w,e)=6 [lower×2 + newest×4]
    //  2: (l,o)=5 ties (s,t)=5, 'l' < 's'
    //  3: (s,t)=5
    //  4: (e,we)=4 ties (n,e)=4 and (we,st)=4, 'e' wins
    assert(got == Seq(
      (1, "w", "e", "we", 6L),
      (2, "l", "o", "lo", 5L),
      (3, "s", "t", "st", 5L),
      (4, "e", "we", "ewe", 4L)))
  }

  test("bpeTokenCounts: the learned merges segment the corpus by hand") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // after [we, lo, st, ewe]: low→[lo,w]=2, lower→[lo,we,r]=3,
    // newest→[n,ewe,st]=3, widest→[w,i,d,e,st]=5
    assert(got(1L) == ((3 * 2 + 2 * 3, 5L)))  // 12 tokens / 5 words
    assert(got(2L) == ((4 * 3 + 1 * 5, 5L)))  // 17 tokens / 5 words
  }

  test("bpeTrain: overlapping-run counting, greedy fuse, early exhaustion") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    // counts see all 3 adjacent (a,a) positions per word; the merge
    // itself applies leftmost NON-overlapping (aaaa -> aa,aa), and
    // once each word is one symbol the loop stops short of 5
    assert(got == Seq((1, "aa", 9L), (2, "aaaa", 3L)))
  }

  test("bpeTrain: a merge never fuses across a multi-char symbol start") {
    import spark.implicits._
    // regression: a literal substring replace of '|e|s' also matches
    // '|l|e|st' (where the symbols are e, st — st merely STARTS with
    // s), wrongly producing l, es, t. The boundary-correct fold leaves
    // 'lest' as l, e, st after merges (s,t) then (e,s).
    val docs = Seq((1L, "st st st st es es lest")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSeq
    // 1: (s,t)=5 [st×4 + lest]; 2: (e,s)=2 [es×2 — NOT lest's e|st];
    // 3: lest is l|e|st, pairs (e,st) and (l,e) tie at 1, 'e' wins.
    // The buggy replace had made lest l|es|t, learning (es,t) instead.
    assert(got == Seq(
      (1, "s", "t", 5L), (2, "e", "s", 2L), (3, "e", "st", 1L)))
  }

  test("urlCanonicalize + registeredDomain: the variant table by hand") {
    import spark.implicits._
    val got = Seq(
      "HTTPS://WWW.Example.COM:443/path?utm_source=a&b=2#frag",
      "http://site.org:80/",
      "https://Sub.Domain.Co/x?utm_a=1",
      "no-scheme-text",
      "https://bare.io",
      "https://x.com/p?utm_s=1&a=1&b=2", // TWO surviving params
      "http://x.com:443/a",              // NOT a default port for http
      "https://example.com./x",          // trailing-dot FQDN
      "http://x.com/a&b?utm_s=1&c=2",    // literal '&' in the PATH
      "a&b",                             // non-URL with '&'
      "http://x.com/a&utm_x/b",          // '&utm_' in the PATH, no query
      "http://x.com/a&utm_x/b?r=1&utm_t=2", // path '&utm_' AND a query
      "http://10.1.2.3/x",               // IPv4-literal host
      "https://News.BBC.CO.UK/x",        // multi-label public suffix
      "http://[2001:db8::1]/x")          // bracketed IPv6 host
      .toDF("u")
      .select(TextAnalysis.urlCanonicalize(col("u")),
        TextAnalysis.registeredDomain(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got(0) == (("https://www.example.com/path?b=2", "example.com")))
    // bare "/" path drops with the default port
    assert(got(1) == (("http://site.org", "site.org")))
    // utm-only query disappears entirely; two-label rule on the host
    assert(got(2) == (("https://sub.domain.co/x", "domain.co")))
    // non-URLs pass through the head-missing branch unharmed
    assert(got(3) == (("no-scheme-text", "")))
    assert(got(4) == (("https://bare.io", "bare.io")))
    // the ?-re-anchor must hit the FIRST ampersand (a greedy group
    // would produce "...p&a=1?b=2")
    assert(got(5) == (("https://x.com/p?a=1&b=2", "x.com")))
    // :443 is only a default port for https
    assert(got(6) == (("http://x.com:443/a", "x.com")))
    // trailing dot stripped before the two-label extract
    assert(got(7) == (("https://example.com./x", "example.com")))
    // the utm strip is position-aware: a path ampersand is never
    // rewritten into a query separator
    assert(got(8) == (("http://x.com/a&b?c=2", "x.com")))
    // non-URLs with '&' pass through byte-identical
    assert(got(9) == (("a&b", "")))
    // the utm strip is query-only: a literal '&utm_' in the PATH of a
    // query-less URL survives byte-identical (the old unanchored pass
    // 3 stripped '&utm_x/b' here — silent dedup-key corruption)
    assert(got(10) == (("http://x.com/a&utm_x/b", "x.com")))
    // ... and with a query present, the path still survives while the
    // query's real utm param drops
    assert(got(11) == (("http://x.com/a&utm_x/b?r=1", "x.com")))
    // IP-literal hosts pass through whole — no label rule
    assert(got(12) == (("http://10.1.2.3/x", "10.1.2.3")))
    // multi-label public suffix: bbc.co.uk, NOT co.uk
    assert(got(13) == (("https://news.bbc.co.uk/x", "bbc.co.uk")))
    // bracketed IPv6 captured whole by the host extract, guard holds
    assert(got(14) == (("http://[2001:db8::1]/x", "[2001:db8::1]")))
  }

  test("urlCanonicalize + registeredDomain: 240 seeded-random URLs " +
    "equal an independent imperative replay") {
    import spark.implicits._
    // the replay is PARAM-LIST + char-scan based — no serial regex
    // passes — so a formulation bug in the operator's regex chain
    // (the class the d73 oracle is structurally blind to, since it
    // replays the same regexes) cannot hide in both
    def replayCanon(u: String): String = {
      val noFrag = u.takeWhile(_ != '#')
      val qi = noFrag.indexOf('?')
      val (path, query) =
        if (qi < 0) (noFrag, "") else (noFrag.take(qi), noFrag.drop(qi))
      val fixedQ =
        if (query.isEmpty) ""
        else {
          val kept = query.drop(1).split("&", -1).toSeq
            .filterNot(_.startsWith("utm_"))
          if (kept.isEmpty) "" else "?" + kept.mkString("&")
        }
      val fixed = path + fixedQ
      val si = fixed.indexOf("://")
      val schemeOk = si > 0 &&
        fixed(0).toString.matches("[a-zA-Z]") &&
        fixed.substring(1, si).forall(c =>
          c.toString.matches("[a-zA-Z0-9+.\\-]"))
      if (!schemeOk) fixed
      else {
        val afterScheme = fixed.drop(si + 3)
        val hostLen = afterScheme.indexWhere(c => c == '/' || c == '?')
        val host = if (hostLen < 0) afterScheme
                   else afterScheme.take(hostLen)
        val head = fixed.take(si + 3) + host
        val tail = fixed.drop(head.length)
        val lowHead = head.toLowerCase
        val canonHead =
          if (lowHead.startsWith("http://") &&
            lowHead.endsWith(":80")) lowHead.dropRight(3)
          else if (lowHead.startsWith("https://") &&
            lowHead.endsWith(":443")) lowHead.dropRight(4)
          else lowHead
        if (tail == "/") canonHead else canonHead + tail
      }
    }
    def replayDomain(u: String): String = {
      val lu = u.toLowerCase
      val si = lu.indexOf("://")
      val schemeOk = si > 0 && lu(0).toString.matches("[a-z]") &&
        lu.substring(1, si).forall(c =>
          c.toString.matches("[a-z0-9+.\\-]"))
      if (!schemeOk) ""
      else {
        val after = lu.drop(si + 3)
        val host =
          if (after.startsWith("[")) {
            val e = after.indexOf(']')
            if (e < 0) {
              val cut = after.indexWhere(c => "/:?#".contains(c))
              if (cut < 0) after else after.take(cut)
            } else after.take(e + 1)
          } else {
            val cut = after.indexWhere(c => "/:?#".contains(c))
            if (cut < 0) after else after.take(cut)
          }
        val stripped = {
          val noDot = if (host.endsWith(".")) host.dropRight(1) else host
          if (noDot.startsWith("www.")) noDot.drop(4) else noDot
        }
        if (stripped.startsWith("[") ||
          (stripped.nonEmpty && stripped.forall(c =>
            c.isDigit || c == '.'))) stripped
        else {
          val labels = stripped.split("\\.", -1)
          val multi = TextAnalysis.MultiLabelSuffixes.toSet
          if (labels.length >= 3 &&
            multi.contains(labels.takeRight(2).mkString(".")) &&
            labels.takeRight(3).head.nonEmpty &&
            labels.takeRight(2).forall(_.nonEmpty))
            labels.takeRight(3).mkString(".")
          else if (labels.length >= 2 && labels.takeRight(2)
            .forall(_.nonEmpty)) labels.takeRight(2).mkString(".")
          else stripped
        }
      }
    }
    val rnd = new scala.util.Random(7L)
    val schemes = Vector("http://", "HTTPS://", "ftp://", "")
    val hosts = Vector("WWW.Example.COM", "News.BBC.co.uk", "x.com",
      "10.1.2.3", "[2001:db8::1]", "bare", "sub.dom.co.jp",
      "example.com.", "a-b.io")
    val ports = Vector("", ":80", ":443", ":8080")
    val paths = Vector("", "/", "/a", "/a&b", "/x&utm_z/t", "/p/q")
    val queries = Vector("", "?a=1", "?utm_s=1", "?utm_s=1&a=1",
      "?a=1&utm_s=2", "?utm_a&utm_b", "?a=1&b=2&utm_c=3", "?a=1&&utm_x")
    val frags = Vector("", "#f", "#x?y")
    val urls = (0 until 240).map { _ =>
      schemes(rnd.nextInt(schemes.size)) +
        hosts(rnd.nextInt(hosts.size)) +
        ports(rnd.nextInt(ports.size)) +
        paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) +
        frags(rnd.nextInt(frags.size))
    }
    val got = urls.toDF("u")
      .select(col("u"), TextAnalysis.urlCanonicalize(col("u")),
        TextAnalysis.registeredDomain(col("u")))
      .collect().map(r => (r.getString(0),
        (r.getString(1), r.getString(2))))
    got.foreach { case (u, (canon, dom)) =>
      assert(canon == replayCanon(u), s"canon '$u': got '$canon' " +
        s"want '${replayCanon(u)}'")
      assert(dom == replayDomain(u), s"domain '$u': got '$dom' " +
        s"want '${replayDomain(u)}'")
    }
  }

  test("c4LineRules: the rule table by hand") {
    import spark.implicits._
    val good = Seq(
      "One decent sentence with plenty of words here.",
      "Two decent sentences with plenty of words here.",
      "Three decent sentences with plenty of words here.",
      "Four decent sentences with plenty of words here.",
      "Five decent sentences with plenty of words here.")
    val docs = Seq(
      (1L, "This sentence has more than five words total.\n" +
        "short one.\n" +                      // < 5 words
        "too few words here.\n" +             // < 5 words
        "this line mentions javascript somewhere fine.\n" + // banned
        "Another proper sentence with enough words here!\n" +
        "no terminal punctuation in this line with words"),
      (2L, good.mkString("\n")),              // 5 kept -> page kept
      (3L, good.mkString("\n") + "\ncode { block"),   // brace kills
      (4L, good.mkString("\n") +
        "\nLorem Ipsum dolor sit amet consectetur adipiscing elit."),
      // 4 kept lines miss the c4_utils 5-sentence page floor
      (5L, good.take(4).mkString("\n")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.c4LineRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4)))
      .toMap
    assert(got(1L) == ((6, 2, false,
      "This sentence has more than five words total.\n" +
        "Another proper sentence with enough words here!")))
    assert(got(2L) == ((5, 5, true, good.mkString("\n"))))
    // the brace rule reads the RAW text, not the surviving lines
    assert(got(3L) == ((6, 5, false, good.mkString("\n"))))
    // lorem ipsum matches case-insensitively even in a passing line
    assert(got(4L)._2 == 6 && !got(4L)._3)
    // one short of the page floor: lines keep, the page does not
    assert(got(5L) == ((4, 4, false, good.take(4).mkString("\n"))))
    // CRLF: a trailing \r defeats the terminal-punct rule on BOTH
    // engines (\z anchor — Java's $ would have matched before the \r
    // while RE2's would not, a silent gate divergence)
    val crlf = Seq((9L,
      "A proper sentence with enough words here.\r\nplain tail"))
      .toDF("doc_id", "text")
    val g9 = TextAnalysis.c4LineRules(crlf, "doc_id", "text")
      .collect()(0)
    assert(g9.getInt(2) == 0 && g9.getString(4) == "")
    // passThrough rides an input column through the per-row
    // projection unchanged (the r18 lang ride-through): same flags
    // and rebuilt text, with the extra column between id and stats
    val pt = TextAnalysis.c4LineRules(
        docs.withColumn("lang", concat(lit("l"), col("doc_id"))),
        "doc_id", "text", passThrough = Seq("lang"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4),
          r.getString(5)))).toMap
    assert(pt(2L) == (("l2", 5, 5, true, good.mkString("\n"))))
    assert(pt(5L)._1 == "l5" && pt(5L)._3 == 4 && !pt(5L)._4)
  }

  test("gopherNgramStats: hand-computed top and dup fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"),
      // "p q r s t" repeats at positions 1 and 6: dup5 covers tokens
      // 1..10 of 11 single-char tokens
      (2L, "p q r s t p q r s t u"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherNgramStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 9).map(r.getDouble).toList).toMap
    // doc 1: totc=5; top2 "a b" x2 * 2 chars / 5; top3 "a b a"
    // (lexicographic tie-break) 3/5; top4 "a b a b" 4/5; no dup>=5
    assert(got(1L) == List(0.8, 0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    // doc 2: totc=11; top2 "p q" 2*2/11; top3 "p q r" 2*3/11; top4
    // "p q r s" 2*4/11; dup5 covers positions 1..10 -> 10/11; no
    // duplicated 6..10-grams
    assert(got(2L) == List(0.363636, 0.545455, 0.727273, 0.909091,
      0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("gopherNgramStats: 40 seeded-random docs equal an independent " +
    "imperative replay") {
    import spark.implicits._
    // small vocab + short docs force heavy gram collisions, so every
    // branch (ties, overlapping dup windows, length < n, empty doc)
    // is exercised; the replay shares NO code with the operator —
    // the DuckDB-oracle discipline, Scala flavor
    val rnd = new scala.util.Random(42L)
    val vocab = Vector("aa", "b", "ccc", "dd", "e", "fff", "g", "hh")
    val docs = (0 until 40).map { i =>
      val len = rnd.nextInt(31)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def replay(text: String): List[Double] = {
      val ws = text.split("\\s+").filter(_.nonEmpty).toSeq
      val totc = ws.map(_.length).sum
      val tops = (2 to 4).map { n =>
        if (ws.size < n || totc == 0) 0.0
        else {
          val cnt = ws.sliding(n).filter(_.size == n)
            .map(_.mkString(" ")).toSeq
            .groupBy(identity).map { case (g, o) => (g, o.size) }
          val (g, c) = cnt.toSeq.minBy { case (gr, k) => (-k, gr) }
          r6(c.toDouble * (g.length - (n - 1)) / totc)
        }
      }
      val dups = (5 to 10).map { n =>
        if (ws.size < n || totc == 0) 0.0
        else {
          val gs = ws.sliding(n).filter(_.size == n)
            .map(_.mkString(" ")).toSeq.zipWithIndex
            .map { case (g, i0) => (g, i0 + 1) }
          val cnt = gs.groupBy(_._1).map { case (g, o) => (g, o.size) }
          val covered = gs.filter(p => cnt(p._1) >= 2)
            .flatMap { case (_, i) => i until (i + n) }.toSet
          r6(covered.toSeq.map(j => ws(j - 1).length).sum.toDouble
            / totc)
        }
      }
      (tops ++ dups).toList
    }
    val got = TextAnalysis.gopherNgramStats(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 9).map(r.getDouble).toList).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == replay(text),
        s"doc $id '$text': ${got(id)} vs ${replay(text)}")
    }
  }

  test("lineRepetitionStats: hand-computed fractions, blanks ignored") {
    import spark.implicits._
    // NB trim() strips SPACES only (Spark and DuckDB agree) — a
    // tab-only line counts as content, same as in lineDedup
    val docs = Seq(
      (1L, "aaaa\nbb\n  \naaaa\ncc"),  // aaaa x2 (4 chars), bb, cc
      (2L, "unique line"),
      (3L, "   \n "))                    // space-only: no evidence row
      .toDF("doc_id", "text")
    val got = TextAnalysis.lineRepetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // doc 1: 4 non-blank lines, 1 extra 'aaaa'; char frac = 4/(8+2+2)
    assert(got(1L) == ((4L, 1L, 0.25, math.rint(4.0 / 12 * 1e6) / 1e6)))
    assert(got(2L) == ((1L, 0L, 0.0, 0.0)))
    assert(!got.contains(3L))
  }

  test("knBigramScore: hand-computed Kneser-Ney on a 3-type corpus") {
    import spark.implicits._
    // bigrams: (a,b)x2, (b,a)x1 from doc 1; (b,c)x1 from doc 2
    // cc: a->2, b->2; N1+(a.)=1, N1+(b.)=2; N1+(.b)=1, N1+(.a)=1,
    // N1+(.c)=1; T=3
    // p(b|a) = (2-.75)/2 + .75*1/2*(1/3) = 0.75   -> ln = -287682 µ
    // p(a|b) = (1-.75)/2 + .75*2/2*(1/3) = 0.375  -> ln = -980829 µ
    // p(c|b) = same 0.375                          -> ln = -980829 µ
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == ((3L, 2L * -287682L + -980829L)))
    assert(got(2L) == ((1L, -980829L)))
    assert(!got.contains(3L))  // < 2 tokens: no evidence
  }

  test("knSnapshot merge: disjoint partials validate and score as " +
    "the full build; a duplicated doc trips the detector") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val merged = TextAnalysis.mergeKnSnapshots(Seq(
      TextAnalysis.knSnapshot(docs.filter(col("doc_id") <= 1),
        "doc_id", "text"),
      TextAnalysis.knSnapshot(docs.filter(col("doc_id") > 1),
        "doc_id", "text")))
    // a marker per doc — including doc 3, which has no bigram rows
    TextAnalysis.validateKnSnapshot(merged)
    assert(merged.filter(col("bf") === 0L).count() == 3)
    def scores(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.knScoreFromSnapshot(df, materialize = false)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2))).toSet
    assert(scores(merged) ==
      scores(TextAnalysis.knSnapshot(docs, "doc_id", "text")))
    // doc 2 re-crawled into both batches: loud, not silent drift
    val dup = TextAnalysis.mergeKnSnapshots(Seq(
      TextAnalysis.knSnapshot(docs, "doc_id", "text"),
      TextAnalysis.knSnapshot(docs.filter(col("doc_id") === 2),
        "doc_id", "text")))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.validateKnSnapshot(dup)
    }
    assert(e.getMessage.contains("kn snapshot corrupt"))
  }

  test("token metrics") {
    val r = Seq("ab cd  ef ab").toDF("t").select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.distinctTokenCount(col("t")),
      TextAnalysis.meanWordLen(col("t"))).collect().head
    assert(r.getInt(0) == 4 && r.getInt(1) == 3)
    assert(r.getDouble(2) == 2.0)
  }

  test("punctRatio and stopwordRatio") {
    val r = Seq("a, b! the c").toDF("t").select(
      TextAnalysis.punctRatio(col("t")),
      TextAnalysis.stopwordRatio(col("t"))).collect().head
    assert(math.abs(r.getDouble(0) - 2.0 / 11) < 1e-12)
    // tokens: "a,","b!","the","c" — only bare "the" hits the stop set
    assert(math.abs(r.getDouble(1) - 1.0 / 4) < 1e-12)
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h tail tail tail"),  // shares the full window
      (2L, "x b c d e f g h i"),               // windows differ at edges
      (3L, "p q r s t u v w"),                 // disjoint
      (4L, "short doc"))                       // < 8 words
      .toDF("doc_id", "text")
    val bench = Seq("a b c d e f g h i").toDF("btext")
    val hits = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 shares window [a..h]; doc2 shares [b..i]; bench has both
    assert(hits == Map(1L -> 1L, 2L -> 1L))
  }

  test("unigramLmScore: hand-checked micros, rare tokens score lower") {
    import spark.implicits._
    // corpus: "a" x3, "b" x1 → total 4; ln(3/4), ln(1/4)
    val docs = Seq((1L, "a a b"), (2L, "a"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lpA = math.round(math.log(3.0 / 4.0) * 1e6) // per-term micros
    val lpB = math.round(math.log(1.0 / 4.0) * 1e6)
    assert(out.toSeq == Seq(
      (1L, 3L, 2 * lpA + lpB), // doc 1: a,a,b
      (2L, 1L, lpA)))          // doc 3 (no tokens) absent
    // the all-common doc is more "typical" per token than doc 1
    assert(lpA > (2 * lpA + lpB) / 3.0)
  }

  test("bigramLmScore: hand-checked Laplace micros, 1-token doc absent") {
    import spark.implicits._
    // bigrams: doc1 (a,b)x2 (b,a)x1; doc2 (b,a)x1; corpus counts
    // (a,b)=2 (b,a)=2, contexts c(a)=2 c(b)=2, vocab {a,b,x} V=3
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lp = math.round(math.log((2.0 + 1) / (2 + 3)) * 1e6) // both bigrams
    assert(out.toSeq == Seq((1L, 3L, 3 * lp), (2L, 1L, lp)))
  }

  test("bigramLmScore ranks fluent transitions above shuffled tokens") {
    import spark.implicits._
    // same token multiset, different order: unigram stats are blind to
    // this, the transition model is the point of the operator
    val docs = Seq((1L, "a b a b a b"), (2L, "a a a b b b"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) > m(2L),
      s"fluent doc should outscore shuffled: ${m(1L)} vs ${m(2L)}")
    val u = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(u(1L) == u(2L), "unigram can't separate them — bigram must")
  }

  test("perplexityBuckets: per-language NTILE cut tracks LM rank") {
    import spark.implicits._
    // en: three docs with strictly decreasing bigram fluency (fluent
    // repetition > mixed > shuffled); de: two docs → buckets 1 and 2
    // of a 3-cut (NTILE with fewer rows than tiles)
    val docs = Seq(
      (1L, "a b a b a b a b", "en"),
      (2L, "a b a b c d c d", "en"),
      (3L, "a a c b b d a c", "en"),
      (10L, "x y x y", "de"),
      (11L, "y x z z", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis
      .perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4),
        r.getInt(5))).toMap
    val en = Seq(1L, 2L, 3L).map(out(_))
    assert(en.map(_._3) == Seq(1, 2, 3), s"en buckets: $en")
    assert(en.map(_._2) == en.map(_._2).sorted.reverse,
      "bucket order must follow descending mean log-prob")
    assert(Seq(10L, 11L).map(out(_)._3).sorted == Seq(1, 2))
    assert(out.values.forall(v => v._1 == "en" || v._1 == "de"))
  }

  test("chunkByTokens: stride windows, short tail, empty doc drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // chunk 4 overlap 1 → stride 3
      (2L, "a b"),                  // shorter than one chunk
      (3L, "   "),                  // no tokens → no chunks
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8")) // short tail with new content
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      // NO (1, 2, "t7") tail: start 6 would be pure overlap — t7 is
      // already the last token of the previous chunk
      (2L, 0L, 2L, "a b"),
      (4L, 0L, 4L, "x1 x2 x3 x4"),
      (4L, 1L, 4L, "x4 x5 x6 x7"),
      (4L, 2L, 2L, "x7 x8"))) // x8 is new → tail IS emitted
  }

  test("chunkByTokens reconstructs the document on seeded random sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val docs = (1L to 60L).map { i =>
      (i, (1 to rnd.nextInt(300)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((64, 16), (10, 0), (5, 4))) {
      val stride = chunk - overlap
      val chunks = TextAnalysis.chunkByTokens(docs, "doc_id", "text",
          chunk, overlap)
        .orderBy("doc_id", "chunk_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      docs.collect().foreach { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val toks = text.split("\\s+").filter(_.nonEmpty)
        chunks.get(id) match {
          case None => assert(toks.isEmpty, s"doc $id lost")
          case Some(cs) =>
            // dropping each chunk's leading overlap (except the first)
            // and concatenating reconstructs the doc exactly
            val rebuilt = cs.head.split(" ") ++
              cs.tail.flatMap(_.split(" ").drop(overlap))
            assert(rebuilt.toSeq == toks.toSeq,
              s"doc $id not reconstructed at ($chunk,$overlap)")
        }
      }
    }
  }

  test("repetitionStats: dup-word fraction and top-bigram dominance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b c"),   // bigram "a b" x3 of 6; words 7, uniq 3
      (2L, "x y z"),           // all distinct; 2 bigrams, tie -> "x y"
      (3L, "solo"),            // <2 words -> dropped
      (4L, ""), (5L, "   "))   // zero words -> dropped, must not crash
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L))
    val d1 = r(1L)
    assert(d1.getInt(1) == 7 && d1.getInt(2) == 3)
    assert(d1.getString(4) == "a b" && d1.getLong(5) == 3L)
    assert(math.abs(d1.getDouble(6) - 0.5) < 1e-9)
    assert(math.abs(d1.getDouble(3) - 0.571429) < 1e-9) // round(1-3/7, 6)
    assert(r(2L).getString(4) == "x y") // count-tie broken by bigram asc
    assert(r(2L).getDouble(3) == 0.0)
  }

  test("piiRedact: ordered patterns, multiple hits, cc beats phone shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      ("a@b.com wrote to c.d@e.org", 1),
      ("from 10.0.0.1 to 192.168.1.255", 2),
      // a grouped card number must NOT be eaten by the phone pattern
      ("pay 4012 3456 7890 1234 or call +44 123 45678", 3),
      ("clean text, no pii", 4))
      .toDF("text", "id")
    val out = docs.select(Seq(col("id"),
      TextAnalysis.piiRedact(col("text")).as("r")) ++
      TextAnalysis.piiCounts(col("text")): _*)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getString(1) == "<EMAIL> wrote to <EMAIL>")
    assert(out(1).getInt(2) == 2) // n_email
    assert(out(2).getString(1) == "from <IP> to <IP>")
    assert(out(3).getString(1) == "pay <CC> or call <PHONE>")
    assert(out(3).getInt(4) == 1 && out(3).getInt(5) == 1)
    assert(out(4).getString(1) == "clean text, no pii")
    assert((2 to 5).forall(i => out(4).getInt(i) == 0))
  }

  test("stripMarkup: blocks dropped whole, tags spaced, entities decoded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // script/style contents vanish entirely (incl. a bare `<` inside)
      ("<style>p { color: red }</style><script>if (1 < 2) { x=1; }</script>hello", 1),
      // tags become spaces (no word gluing); attributes don't leak
      ("""before<br/><a href="u">link</a>after""", 2),
      // entity decode incl. double-escaped &amp;lt; -> literal &lt;
      ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;keep&amp;gt; c&nbsp;d", 3),
      // multiline block with (?s): the . must cross the newline
      ("x<script>\nvar y = 2\n</script>y", 4),
      ("plain text stays", 5))
      .toDF("text", "id")
    val out = docs.select(col("id"),
        TextAnalysis.stripMarkup(col("text")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "hello")
    assert(out(2) == "before link after")
    assert(out(3) == "a & b <tag> \"q\" 's' &lt;keep&gt; c d")
    assert(out(4) == "x y")
    assert(out(5) == "plain text stays")
  }

  test("stripMarkupKeepLines: newlines survive, per-line collapse, " +
    "cross-line blocks still strip whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // line structure kept; inner runs collapse per line
      ("<p>first   line.</p>\n<p>second  line.</p>", 1),
      // a block spanning lines strips whole, leaving ONE line (the
      // block's newlines vanish with its contents)
      ("x<script>\nvar y = 2\n</script>y", 2),
      // a tags-only line becomes an EMPTY line, not a deleted one
      ("<div>\nbody stays &amp; holds.\n</div>", 3))
      .toDF("text", "id")
    val out = docs.select(col("id"),
        TextAnalysis.stripMarkupKeepLines(col("text")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "first line.\nsecond line.")
    assert(out(2) == "x y")
    assert(out(3) == "\nbody stays & holds.\n")
    // and the parent's single-line contract is unchanged: same chain,
    // global collapse
    val flat = docs.select(col("id"),
        TextAnalysis.stripMarkup(col("text")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(flat(1) == "first line. second line.")
    assert(flat(3) == "body stays & holds.")
  }

  test("gopherRules: hand-computed features and rule flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1: a passing doc — 52 words incl. 2 stop words, all alphabetic,
    //    mean length in range, no symbols/bullets/ellipses
    val good = (("the quick brown fox jumps with vigor today " * 6) +
      "alpha beta gamma delta").trim // 8*6+4 = 52 words
    val docs = Seq(
      (1L, good),
      // 2: bullets + ellipsis lines: 4 lines, 3 bulleted, 2 ellipsis-ended
      (2L, "- one thing\n* two things…\n• three things...\nplain tail"),
      // 3: symbol-heavy: 2 words, '#'x3 + '...'x1 (4 symbols in 5 dots)
      (3L, "## # w1 w2....."),
      // 4: numeric-only words fail the alpha rule
      (4L, "111 222 333 444"),
      (5L, ""), (6L, "   \n  \n"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getInt(1) == 52 && d1.getInt(7) == 2) // n_words, n_stop_hits
    assert(d1.getBoolean(8) && d1.getBoolean(9) && d1.getBoolean(14))
    assert(d1.getBoolean(15), "doc 1 must pass all rules")
    val d2 = r(2L)
    assert(d2.getDouble(4) == 0.75, "bullet_line_frac 3/4")
    assert(d2.getDouble(5) == 0.5, "ellipsis_line_frac 2/4")
    assert(d2.getBoolean(11) && !d2.getBoolean(12)) // bullet ok, ellipsis not
    val d3 = r(3L)
    // words: ##, #, w1, w2..... -> 4; symbols: '#'x3 + '...'x1 = 4
    assert(d3.getInt(1) == 4 && d3.getDouble(3) == 1.0)
    assert(!d3.getBoolean(10), "symbol rule fails")
    val d4 = r(4L)
    assert(d4.getDouble(6) == 0.0 && !d4.getBoolean(13), "alpha rule fails")
    // empty docs: all denominators ground to 0.0, nothing is null
    Seq(5L, 6L).foreach { id =>
      val d = r(id)
      assert(d.getInt(1) == 0 && d.getDouble(2) == 0.0
        && d.getDouble(6) == 0.0 && !d.getBoolean(15))
    }
  }
}

class MultimodalSpec extends SparkSpec {

  test("extractMeta: deterministic stub decode over binary payloads") {
    implicit val s = spark
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(10)
    val meta = Multimodal.extractMeta(Multimodal.asMedia(docs))
    val rows = meta.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getInt(1)
      assert(r.getInt(2) == n % 640 && r.getInt(3) == (n * 7) % 480)
      assert(r.getString(4).matches("[0-9a-f]{32}"))
    }
    // deterministic across runs
    val again = Multimodal.extractMeta(Multimodal.asMedia(docs)).collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("frameSample slices every stride-th fixed-width frame") {
    implicit val s = spark
    import spark.implicits._
    val one = Seq((1L, ("x" * 25).getBytes, "m")).toDF("doc_id", "media", "mime")
    val frames = Multimodal.frameSample(one, frameBytes = 10, stride = 2)
      .collect()
    // 25 bytes / 10 = 2 frames, stride 2 keeps frame 0 only
    assert(frames.map(_.getInt(1)).toSeq == Seq(0))
    assert(frames.head.getAs[Array[Byte]](2).length == 10)
  }

  test("resizePlan fits in box, preserves aspect, guards zero dims") {
    implicit val s = spark
    import spark.implicits._
    // media of 1000 bytes: src 360x40 -> scale min(320/360, 240/40)
    val one = Seq((1L, new Array[Byte](1000), "m")).toDF("doc_id", "media", "mime")
    val r = Multimodal.resizePlan(one, 320, 240).collect().head
    assert(r.getInt(1) == 1000 % 640 && r.getInt(2) == 7000 % 480)
    val scale = math.min(320.0 / (1000 % 640), 240.0 / (7000 % 480))
    assert(r.getInt(3) == math.floor((1000 % 640) * scale).toInt)
    // 640-byte payload -> src_w 0 -> 0x0 output
    val z = Seq((2L, new Array[Byte](640), "m")).toDF("doc_id", "media", "mime")
    assert(Multimodal.resizePlan(z, 320, 240).collect().head.getInt(3) == 0)
  }

  test("featureVector: 4 deterministic 32-bit features per payload") {
    implicit val s = spark
    import spark.implicits._
    val one = Seq((1L, "abc".getBytes, "m")).toDF("doc_id", "media", "mime")
    val r = Multimodal.featureVector(one).collect().head
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(r.getLong(1) == java.lang.Long.parseLong("90015098", 16))
    assert(r.getLong(4) == java.lang.Long.parseLong("28e17f72", 16))
  }
}
