package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("strHash matches the reference polynomial fold") {
    def ref(s: String): Long =
      s.foldLeft(TextOps.HashSeed)((acc, c) => (acc * 31 + c.toLong) % TextOps.P)
    for (s <- Seq("hello", "a", "spark engine", "zzzz")) {
      val got = one(s).select(TextOps.strHash(col("t"))).head.getLong(0)
      assert(got == ref(s), s"hash of '$s'")
    }
  }

  test("native strHash kernel equals the higher-order fold") {
    val strs = Seq("hello world", "", "a", "key agg row scan slow",
      "zzzz qqqq xxxx yyyy")
    for (s <- strs) {
      val r = one(s).select(
        TextOps.strHash(col("t")), TextOps.strHashHof(col("t"))).head
      assert(r.getLong(0) == r.getLong(1), s"mismatch on '$s'")
    }
  }

  test("token counts: whitespace, distinct, bpe, regex") {
    val df = one("aa bb aa cccccc")
    val r = df.select(
      TextOps.tokenCount(col("t")),
      TextOps.uniqueTokenCount(col("t")),
      TextOps.bpeTokenCount(col("t")),
      TextOps.regexTokenCount(col("t"))).head
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 3)
    // ceil(2/4)*3 + ceil(6/4) = 3 + 2
    assert(r.getLong(2) == 5L)
    assert(r.getInt(3) == 4)
  }

  test("empty text yields zero tokens (and null-safe ratios upstream)") {
    val r = one("").select(TextOps.tokenCount(col("t"))).head
    assert(r.getInt(0) == 0)
  }

  test("fingerprint is order-sensitive; identical token sequences collide") {
    val fp = (s: String) => one(s).select(TextOps.fingerprint(col("t"))).head.getLong(0)
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
  }

  test("langId: argmax with alphabetical tie-break, und when no hits") {
    val pred = (s: String) => one(s).select(TextOps.langId(col("t"))).head.getString(0)
    assert(pred("der die und") == "de")
    assert(pred("the fast slow") == "en")
    // 'window' (de) vs 'the' (en): tie 1-1 → alphabetical first = de
    assert(pred("window the") == "de")
    assert(pred("qqq www") == "und")
  }

  test("dupNgramFraction: repeated phrase high, unique text 0, short text 0") {
    val df = Seq(
      (1L, "the cat sat the cat sat the cat sat"), // heavy 3-gram repeats
      (2L, "one two three four five six"), // all distinct
      (3L, "hi") // shorter than n
    ).toDF("id", "text")
    val r = df.select(col("id"),
        TextOps.dupNgramFraction(col("text"), 3).as("d3"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 7 total 3-grams, 3 distinct -> 1 - 3/7
    assert(math.abs(r(1L) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(r(2L) == 0.0)
    assert(r(3L) == 0.0)
  }

  test("quality parts are in expected ranges and deterministic") {
    val df = one("the fast row the fast")
    val r = df.select(
      TextOps.stopwordRatio(col("t")),
      TextOps.avgTokenLen(col("t")),
      TextOps.uniqueRatio(col("t")),
      TextOps.qualityScore(col("t"))).head
    assert(r.getDouble(0) == 1.0) // all tokens are markers
    assert(math.abs(r.getDouble(1) - 17.0 / 5) < 1e-12)
    assert(r.getDouble(2) == 3.0 / 5)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
  }
  test("Pii: counts and redaction for emails, phones, IPv4") {
    import graft.text.Pii
    val df = one("mail me at bob.smith+x@corp.example.org or call +1 555 0100, " +
      "server 10.0.0.7 is down, plain words stay")
    val r = df.select(Pii.emailCount(col("t")), Pii.phoneCount(col("t")),
      Pii.ipv4Count(col("t")), Pii.redact(col("t"))).head
    assert(r.getLong(0) == 1 && r.getLong(1) == 1 && r.getLong(2) == 1)
    val red = r.getString(3)
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    assert(!red.contains("@") && !red.contains("10.0.0.7") && !red.contains("555"))
    assert(red.contains("plain words stay"))
    // no PII -> zero counts, text unchanged
    val clean = one("nothing sensitive here")
      .select(Pii.emailCount(col("t")), Pii.redact(col("t"))).head
    assert(clean.getLong(0) == 0 && clean.getString(1) == "nothing sensitive here")
  }

  test("Decontam: overlap counts against a benchmark set") {
    import graft.text.Decontam
    val bench = Seq((0L, "alpha beta gamma delta")).toDF("id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma epsilon"), // shares "alpha beta gamma"
      (11L, "zeta eta theta iota"),      // no overlap
      (12L, "xy")                        // too short: no shingles
    ).toDF("id", "text")
    val out = Decontam.contamination(corpus, bench, "id", "text", n = 3)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 2L, 1L), (11L, 2L, 0L), (12L, 0L, 0L)))
    assert(out(0).getDouble(3) == 0.5)
    assert(out(2).isNullAt(3)) // no shingles -> null rate
  }

  test("vocabulary counts totals and doc frequency, filters by minCount") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b x")).toDF("id", "t")
    val v = graft.text.Vocab.vocabulary(docs, "id", "t", minCount = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(v == Map("a" -> ((3L, 2L)), "b" -> ((2L, 2L))))
  }

  test("maskTokens: deterministic positional masking, stable across calls") {
    val docs = Seq((7L, "a b c d e f g h i j"), (8L, "a b c d e f g h i j"),
      (9L, "")).toDF("id", "t")
    val out = docs.select(col("id"),
        TextOps.maskTokens(col("id"), col("t"), pct = 30).as("m"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    // same text, different ids → different mask layouts (id is hashed)
    assert(out(0)._2.length == 10 && out(1)._2.length == 10)
    assert(out(0)._2 != out(1)._2)
    // unmasked positions keep their original token
    val orig = "a b c d e f g h i j".split(" ")
    out.take(2).foreach { case (_, m) =>
      m.zipWithIndex.foreach { case (tok, i) =>
        assert(tok == "<mask>" || tok == orig(i))
      }
    }
    // empty text → empty array, no descending-sequence blowup
    assert(out(2)._2.isEmpty)
    // pct 0 masks nothing; pct 100 masks everything
    val ends = docs.where(col("id") === 7L).select(
      TextOps.maskTokens(col("id"), col("t"), 0).as("none"),
      TextOps.maskTokens(col("id"), col("t"), 100).as("all")).head
    assert(ends.getSeq[String](0) == orig.toSeq)
    assert(ends.getSeq[String](1).forall(_ == "<mask>"))
    // deterministic across evaluations
    val again = docs.select(col("id"),
        TextOps.maskTokens(col("id"), col("t"), 30).as("m"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(again.toSeq == out.toSeq)
    // negative ids: the sign-normalized hash keeps pct semantics — pct=0
    // masks nothing (the unnormalized remainder masked early tokens
    // unconditionally)
    val neg = Seq((-5L, ("w " * 150).trim)).toDF("id", "t")
    val negNone = neg.select(TextOps.maskTokens(col("id"), col("t"), 0).as("m"))
      .head.getSeq[String](0)
    assert(negNone.forall(_ == "w"))
    val negSome = neg.select(TextOps.maskTokens(col("id"), col("t"), 15).as("m"))
      .head.getSeq[String](0)
    val frac = negSome.count(_ == "<mask>").toDouble / negSome.size
    assert(frac > 0.02 && frac < 0.5, s"negative-id mask fraction $frac")
  }

  test("bigram LM scoring: hand-computed add-one log-probabilities") {
    val docs = Seq((1L, "a b a b"), (2L, "a b x")).toDF("id", "t")
    val out = graft.text.BigramLm.score(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // counts: (a,b)=3 (b,a)=1 (b,x)=1; unigrams a=3 b=3 x=1, V=3
    // doc1: (2·ln(4/6) + ln(2/6)) / 3;  doc2: (ln(4/6) + ln(2/6)) / 2
    val l23 = math.log(2.0 / 3.0); val l13 = math.log(1.0 / 3.0)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (2 * l23 + l13) / 3) < 1e-6)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (l23 + l13) / 2) < 1e-6)
    // a repetitive doc scores higher than a garbled one under a model
    // fit on normal text
    val corpus = (0L until 50L).map(i => (i, "the quick brown fox jumps")) ++
      Seq((100L, "the quick brown fox jumps"), (101L, "fox the jumps quick brown"))
    val scored = graft.text.BigramLm.score(corpus.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(100L) > scored(101L))
  }

  test("postings: per-term doc lists are capped, sorted, df-filtered") {
    val docs = Seq((1L, "a b"), (2L, "b a a"), (3L, "b")).toDF("id", "t")
    val all = graft.text.Vocab.postings(docs, "id", "t", cap = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // df counts DOCUMENTS (distinct per doc), caps the id list at 2
    assert(all == Map("a" -> ((2L, "1,2")), "b" -> ((3L, "1,2"))))
    val hot = graft.text.Vocab.postings(docs, "id", "t", cap = 2, minDf = 3L)
      .collect().map(_.getString(0)).toSeq
    assert(hot == Seq("b"))
  }

  test("c4Rules: each rule fails on its planted violation, passes a clean doc") {
    val clean = "the quick brown fox jumps over the lazy dog and " +
      "the fast cat runs under a tall tree while the slow dove sits"
    val docs = Seq(
      (1L, clean),                                // 23 varied tokens + stopwords
      (2L, "the tiny doc"),                       // < 20 tokens
      (3L, ("supercalifragilistic " * 25).trim),  // avg len 20 > 12
      (4L, ("qq ww ee rr tt yy uu ii oo pp " * 2 + "aa ss dd ff gg").trim), // no stopword
      (5L, ("xy " * 25).trim)                     // 2-gram dup frac 23/24 > 0.9
    ).toDF("id", "t")
    val stats = docs.select(col("id"),
      TextOps.tokenCount(col("t")).cast("long").as("n_tokens"),
      TextOps.avgTokenLen(col("t")).as("avg_len"),
      TextOps.stopwordRatio(col("t")).as("sw_ratio"),
      TextOps.dupNgramFraction(col("t"), 2).as("dup_frac"))
    val rules = TextOps.c4Rules(col("n_tokens"), col("avg_len"),
      col("sw_ratio"), col("dup_frac"))
    val out = stats.select(col("id") +: rules.map { case (n, p) => p.as(n) }: _*)
      .orderBy("id").collect()
    val names = rules.map(_._1)
    def failed(i: Int): Set[String] =
      names.zipWithIndex.collect { case (n, j) if !out(i).getBoolean(j + 1) => n }.toSet
    assert(failed(0) == Set.empty)
    assert(failed(1).contains("min_tokens"))
    assert(failed(2).contains("avg_token_len"))
    assert(failed(3).contains("has_stopword"))
    assert(failed(4).contains("low_repetition"))
    // doc 5 is ALSO 25 identical 1-char tokens: passes length rules
    assert(!failed(4).contains("min_tokens") && !failed(4).contains("avg_token_len"))
  }

  test("normalize: lowercase, punctuation→space, collapsed, trimmed") {
    val cases = Seq(
      "Hello, World!" -> "hello world",
      "  a\tb\nc  " -> "a b c",
      "UPPER-case_mix 42" -> "upper case mix 42",
      "..." -> "",
      "" -> "",
      "already clean" -> "already clean")
    for ((in, want) <- cases) {
      val got = one(in).select(TextOps.normalize(col("t"))).head.getString(0)
      assert(got == want, s"normalize($in) = $got, want $want")
    }
    // null propagates
    assert(Seq(Option.empty[String]).toDF("t")
      .select(TextOps.normalize(col("t"))).head.isNullAt(0))
  }

  test("hashFeatures: counts land in hashed dims, collisions fold, L1 = tokens") {
    val dim = 16
    def feats(s: String): Seq[Long] =
      one(s).select(TextOps.hashedTokens(col("t"), dim).as("hs"))
        .select(TextOps.hashFeaturesFromHashed(col("hs"), dim))
        .head.getSeq[Long](0)
    def slot(tok: String): Int =
      one(tok).select(TextOps.strHash(col("t")) % dim).head.getLong(0).toInt
    val f = feats("alpha beta alpha gamma")
    assert(f.length == dim && f.sum == 4L) // L1 = token count, always
    assert(f(slot("alpha")) >= 2L)         // both alphas share a slot
    assert(f(slot("beta")) >= 1L && f(slot("gamma")) >= 1L)
    // empty text: the zero vector, not nulls
    val e = feats("")
    assert(e.length == dim && e.forall(_ == 0L))
    // distribution sanity: many distinct tokens spread over most slots
    val many = (1 to 200).map(i => s"tok$i").mkString(" ")
    assert(feats(many).count(_ > 0) > dim / 2)
  }

  test("chunkTexts: overlap windows, short tail, exact counts, empty doc") {
    def chunks(s: String, c: Int, o: Int): Seq[String] =
      one(s).select(TextOps.chunkTexts(TextOps.tokens(col("t")), c, o))
        .head.getSeq[String](0)
    // 7 tokens, size 3, overlap 1 → starts 0,2,4: full coverage, no
    // redundant tail chunk
    val t7 = "a b c d e f g"
    assert(chunks(t7, 3, 1) == Seq("a b c", "c d e", "e f g"))
    // no overlap: clean partition
    assert(chunks(t7, 3, 0) == Seq("a b c", "d e f", "g"))
    // doc shorter than a chunk: exactly one chunk
    assert(chunks("a b", 5, 2) == Seq("a b"))
    // exact multiple: no phantom trailing chunk
    assert(chunks("a b c d", 2, 0) == Seq("a b", "c d"))
    // empty doc: zero chunks, not one empty chunk
    assert(chunks("", 4, 1).isEmpty)
    intercept[IllegalArgumentException] {
      TextOps.chunkTexts(col("t"), 4, 4)
    }
  }

  test("vocab encode: frequency-ranked ids, OOV bucket, position order") {
    import graft.text.Vocab
    val docs = Seq(
      (1L, "b b b a a c"),   // freq: b=3, a=2, c=1
      (2L, "a b zz a"),      // zz is OOV at vocabSize 3... and c cut at 2
      (3L, "")               // empty doc: absent from output
    ).toDF("doc_id", "text")
    // corpus counts: a=4, b=4, c=1, zz=1; the a/b tie breaks
    // alphabetically → a→0, b→1; c/zz cut at vocabSize 2 → OOV id 2
    val out = Vocab.encode(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) == Seq(1, 1, 1, 0, 0, 2))
    assert(out(2L) == Seq(0, 1, 2, 0)) // position order preserved
    assert(!out.contains(3L))
    // tie on count: alphabetical token order breaks it deterministically
    val ties = Seq((1L, "x y")).toDF("doc_id", "text")
    val t = Vocab.encode(ties, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(t(1L) == Seq(0, 1)) // x before y
  }

  test("tokenEntropy: known answers, +0.0 on uniform, null propagation") {
    def ent(s: String): Double =
      one(s).select(TextOps.tokenEntropy(col("t"))).head.getDouble(0)
    assert(math.abs(ent("a b a b") - 1.0) < 1e-12)       // two equiprobable
    assert(math.abs(ent("a b c d") - 2.0) < 1e-12)       // four equiprobable
    // 3/4, 1/4 → -(0.75·log2 0.75 + 0.25·log2 0.25)
    val want = -(0.75 * math.log(0.75) / math.log(2.0) + 0.25 * -2.0)
    assert(math.abs(ent("a a a b") - want) < 1e-12)
    // all-identical tokens: exactly +0.0, never -0.0 (oracle hash parity)
    val z = ent("x x x")
    assert(z == 0.0 && java.lang.Double.doubleToRawLongBits(z) == 0L,
      s"expected +0.0, got ${java.lang.Double.doubleToRawLongBits(z)}")
    assert(ent("") == 0.0)
    assert(Seq(Option.empty[String]).toDF("t")
      .select(TextOps.tokenEntropy(col("t"))).head.isNullAt(0))
  }

  test("blocked fuzzy join pairs within blocks by edit distance only") {
    val df = Seq(
      (1L, "alpha one"), (2L, "alpha oze"),   // dist 1, same block
      (3L, "alpha xyzzy"),                    // same block, dist > 2 from both
      (4L, "beta one"), (5L, "beta one"),     // dist 0, same block
      (6L, "alpho one")                       // dist 1 from id 1 but block differs
    ).toDF("id", "name")
    val pairs = graft.text.FuzzyJoin.blockedPairs(df, "id", "name",
        org.apache.spark.sql.functions.substring_index(col("name"), " ", 1), 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 1), (4L, 5L, 0)))
  }

  test("blocked fuzzy join: exact-duplicate collapse keeps full pair " +
      "semantics (texts follow their ids through the canonical swap)") {
    // three copies of one text + a dist-1 neighbor in the same block:
    // the distance stage sees 2 distinct texts; the output still holds
    // every id-level pair exactly once with id_a < id_b
    val df = Seq(
      (10L, "gamma one"), (7L, "gamma one"), (3L, "gamma one"),
      (5L, "gamma oze")
    ).toDF("id", "name")
    val rows = graft.text.FuzzyJoin.blockedPairs(df, "id", "name",
        org.apache.spark.sql.functions.substring_index(col("name"), " ", 1), 1)
      .as[(Long, String, Long, String, Int)].collect().toSet
    val sameText = Set((3L, 7L), (3L, 10L), (7L, 10L))
      .map { case (a, b) => (a, "gamma one", b, "gamma one", 0) }
    val crossText = Set(
      (3L, "gamma one", 5L, "gamma oze", 1),
      (5L, "gamma oze", 7L, "gamma one", 1),
      (5L, "gamma oze", 10L, "gamma one", 1))
    assert(rows === sameText ++ crossText)
  }

  test("BPE trainer: hand-computed greedy merges on a tiny corpus") {
    import graft.text.BpeTrainer
    // corpus: "abab abab abc" → words abab (c=2), abc (c=1)
    // round 1: (a,b)=2·2+1=5 > (b,a)=2 > (b,c)=1 → merge (a,b)
    // round 2: abab→[ab,ab], abc→[ab,c]: (ab,ab)=2 > (ab,c)=1 → (ab,ab)
    // round 3: only (ab,c)=1 → merge (ab,c); round 4: nothing → stop
    val df = Seq("abab abab abc").toDF("text")
    val t = BpeTrainer.train(df, "text", k = 4)
    assert(t.merges.map(m => (m.p1, m.p2, m.count)) ==
      Seq(("a", "b", 5L), ("ab", "ab", 2L), ("ab", "c", 1L)))
    val fin = t.words.select("w", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(fin("abab") == Seq("abab") && fin("abc") == Seq("abc"))
    // weighted symbol counts after each round: start 2·4+3=11 →
    // merge1 applied 2·2+1=5 times → 6 → merge2 2 → 4 → merge3 1 → 3
    assert(t.weightedSymbols == Seq(6L, 4L, 3L))
  }

  test("BPE merge application is greedy left-to-right, never overlapping") {
    import graft.text.BpeTrainer
    val syms = split(col("t"), "")
    def applied(word: String, p1: String, p2: String): Seq[String] =
      Seq(word).toDF("t")
        .select(BpeTrainer.applyMerge(
          filter(syms, x => x =!= ""), p1, p2).as("s"))
        .as[Seq[String]].head()
    assert(applied("aaa", "a", "a") == Seq("aa", "a"))
    assert(applied("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(applied("abab", "a", "b") == Seq("ab", "ab"))
    assert(applied("ba", "a", "b") == Seq("b", "a"))
  }

  test("compression signal: zlib invariants on known strings") {
    import graft.text.Compress
    val rep = "the cat sat on the mat " * 40 // highly repetitive
    val mix = (0 until 920).map(i => ((i * 7919 + 13) % 93 + 33).toChar).mkString
    val rRep = Compress.deflatedLen(rep)
    val rMix = Compress.deflatedLen(mix)
    // repetition compresses far better than pseudo-random printables
    assert(rRep * 3 < rMix, s"repetitive $rRep should be << mixed $rMix")
    // doubling repetitive text costs almost nothing (back-references)
    assert(Compress.deflatedLen(rep + rep) <= rRep + 64)
    // bounded by stored-block worst case
    assert(rMix > 0 && rMix <= mix.length + mix.length / 1000 + 64)
    // deterministic
    assert(Compress.deflatedLen(mix) == rMix)
    // column form: ratio_e6 is an exact scaled integer
    val d = Seq((1L, rep), (2L, mix)).toDF("id", "t")
    val rows = Compress.withCompressionRatio(d, "t")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("ratio_e6") ==
      rRep.toLong * 1000000L / rep.length)
    assert(rows(0).getAs[Long]("ratio_e6") < rows(1).getAs[Long]("ratio_e6"))
  }
}
