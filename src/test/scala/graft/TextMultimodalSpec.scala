package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.text.TextFunctions

class TextMultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir).cache()

  test("langid: stopword-heavy planted docs classify correctly") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the cat and the dog of the house is in it", "en"),
      (2L, "der hund und die katze ist ein tier von hier", "de"),
      (3L, "el perro y los gatos es un animal que corre", "es")).toDF("doc_id", "text", "lang")
    val out = TextFunctions.langId(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) === "en" && out(2L) === "de" && out(3L) === "es")
  }

  test("quality: ratios bounded in [0,1], score bounded") {
    val q = TextFunctions.quality(docs).cache()
    assert(q.count() === docs.count())
    for (c <- Seq("alpha_ratio", "punct_ratio", "stopword_ratio", "quality_score"))
      assert(q.filter(col(c) < 0.0 || col(c) > 1.0).count() === 0, c)
  }

  test("token counts: re_tokens >= ws_tokens on alnum text, distinct <= total") {
    val t = TextFunctions.tokenCounts(docs)
    assert(t.filter(col("distinct_tokens") > col("ws_tokens")).count() === 0)
    assert(t.filter(col("ws_tokens") <= 0).count() === 0)
  }

  test("corpus report: one row per (lang, source), masses reconcile with the corpus") {
    val rep = TextFunctions.corpusReport(docs).cache()
    assert(rep.count() === docs.select("lang", "source").distinct().count())
    val total = rep.agg(sum("n_docs"), sum("total_chars")).head()
    assert(total.getLong(0) === docs.count())
    assert(total.getLong(1) === docs.agg(sum("n_chars")).head().getLong(0))
    assert(rep.filter(col("min_chars") > col("max_chars")).count() === 0)
  }

  test("corpus mix: cells cover every doc, token shares sum to 1 per split") {
    val mix = TextFunctions.corpusMix(docs).cache()
    assert(mix.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // shares within each split form a distribution
    val bySplit = mix.groupBy("split").agg(sum("token_share").as("s")).collect()
    assert(bySplit.length === 3)
    assert(bySplit.forall(r => math.abs(r.getAs[Double]("s") - 1.0) < 1e-9),
      bySplit.mkString("; "))
    // deterministic: the same assignment hash -> identical report
    val again = TextFunctions.corpusMix(docs.repartition(7))
    assert(mix.exceptAll(again).count() === 0)
  }

  test("repetition: boilerplate flags, natural prose doesn't, short docs null out") {
    import spark.implicits._
    val planted = Seq(
      (1L, "buy now click here buy now click here buy now click here buy now click here"),
      (2L, "each word in this perfectly natural sentence appears exactly once overall"),
      (3L, "too short")).toDF("doc_id", "text")
    val out = TextFunctions.repetition(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("repetitive"), "looped boilerplate must flag")
    assert(out(1L).getAs[Double]("dup_trigram_frac") > 0.5)
    assert(!out(2L).getAs[Boolean]("repetitive"))
    assert(out(2L).getAs[Double]("dup_trigram_frac") === 0.0)
    assert(out(3L).getAs[Int]("n_trigrams") === 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("dup_trigram_frac")))
    // corpus-wide: fractions bounded, trigram count = max(words-2, 0)
    val rep = TextFunctions.repetition(docs)
    assert(rep.filter(col("n_trigrams") =!= greatest(col("n_words") - 2, lit(0))).count() === 0)
    assert(rep.filter(col("dup_word_frac") < 0.0 || col("dup_word_frac") > 1.0).count() === 0)
  }

  test("unigram LM: rare tokens raise a doc's nll above common-token docs") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the the the the the"),          // only common tokens
      (2L, "the the the the zyxqj"))        // one hapax
      .toDF("doc_id", "text")
    val out = TextFunctions.unigramLogProb(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(out(2L) > out(1L), "a hapax token must raise avg_nll")
    val corpus = TextFunctions.unigramLogProb(docs).cache()
    assert(corpus.count() === docs.count())
    assert(corpus.filter(col("avg_nll") <= 0.0).count() === 0, "nll is positive")
    assert(corpus.filter(col("total_nll") < col("avg_nll")).count() === 0)
  }

  test("hashed features: counts preserve token mass, indices bounded, same token same index") {
    import spark.implicits._
    val planted = Seq((1L, "alpha alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val feats = TextFunctions.hashedFeatures(planted).cache()
    assert(feats.filter(col("feat_idx") < 0 || col("feat_idx") >= 4096).count() === 0)
    // token mass is conserved per doc
    val mass = feats.groupBy("doc_id").agg(sum("feat_count").as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("m")).toMap
    assert(mass === Map(1L -> 3L, 2L -> 2L))
    // "alpha" hashes identically across docs: doc 1's count-2 row and one
    // of doc 2's rows share an index
    val d1Alpha = feats.filter(col("doc_id") === 1 && col("feat_count") === 2)
      .head().getAs[Long]("feat_idx")
    assert(feats.filter(col("doc_id") === 2 && col("feat_idx") === d1Alpha).count() === 1)
    val corpus = TextFunctions.hashedFeatures(docs)
    assert(corpus.filter(col("feat_idx") >= 4096).count() === 0)
    assert(corpus.count() > 0)
  }

  test("bigram LM: deterministic transitions score 0 nll, hand-computed mixed prefix") {
    import spark.implicits._
    // bigrams: "a b"×2, "b a"×1, "a c"×1 → prefix a: 3, prefix b: 1
    val planted = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextFunctions.bigramLogProb(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: -ln(2/3) twice + -ln(1/1) → total 2·ln(1.5), over 3 bigrams
    assert(math.abs(out(1L).getAs[Double]("total_nll") - 2 * math.log(1.5)) < 1e-6)
    assert(out(1L).getAs[Long]("n_bigrams") === 3L)
    // doc 2: the lone "a c" transition carries -ln(1/3)
    assert(math.abs(out(2L).getAs[Double]("avg_nll") - math.log(3.0)) < 1e-6)
    // word-salad discrimination the unigram LM can't see: same token MIX,
    // one doc repeats the corpus-dominant transitions, one scrambles them
    val corpus = TextFunctions.bigramLogProb(docs).cache()
    assert(corpus.count() === docs.count())
    assert(corpus.filter(col("avg_nll") < 0.0).count() === 0)
    assert(corpus.filter(col("total_nll") < col("avg_nll")).count() === 0)
  }

  test("bpe pairs: top-k adjacent char pairs, all length 2, counts non-increasing") {
    val top = TextFunctions.bpePairStats(docs).collect()
    assert(top.nonEmpty && top.length <= 100) // toy corpus has < 100 distinct pairs
    assert(top.forall(_.getAs[String]("pair").length == 2))
    val counts = top.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("pair_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("bpe learn: merges equal a single-machine reference; weights non-increasing") {
    import spark.implicits._
    // the classic BPE toy family: shared suffixes ("est", "er") emerge
    val toy = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest low lower")).toDF("doc_id", "text")
    val rounds = 6
    val got = TextFunctions.bpeLearn(toy, rounds)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"), r.getAs[Long]("weight")))

    // single-machine reference: greedy left-to-right merge on the
    // word-frequency table, ties broken (weight desc, left asc, right asc)
    var vocab: Map[List[String], Long] = toy.collect()
      .flatMap(_.getAs[String]("text").split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, os) => w.split("").toList -> os.length.toLong }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, w) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + w
      if (counts.nonEmpty) {
        val ((l, r), w) = counts.toSeq.minBy { case ((l, r), w) => (-w, l, r) }
        expect += ((round, l, r, l + r, w))
        def apply(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == l && b == r => (l + r) :: apply(rest)
          case a :: rest => a :: apply(rest)
          case Nil => Nil
        }
        vocab = vocab.groupBy { case (syms, _) => apply(syms) }
          .map { case (s, m) => s -> m.values.sum }
      }
    }
    assert(got.toSeq === expect.toSeq,
      s"distributed merges ${got.mkString(",")} != reference ${expect.mkString(",")}")
    // invariant: merge weights never increase round over round
    val ws = got.map(_._5)
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, ws.mkString(","))
  }

  test("bpe encode: per-doc counts equal a single-machine reference encoder") {
    import spark.implicits._
    val toy = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest low lower")).toDF("doc_id", "text")
    val rounds = 6
    val merges = TextFunctions.bpeLearn(toy, rounds)
      .orderBy("round").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

    // reference: apply each merge left-to-right greedily, in order
    def encode(word: String): List[String] = {
      var syms = word.split("").toList
      for ((l, r) <- merges) {
        def apply(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (l + r) :: apply(rest)
          case a :: rest => a :: apply(rest)
          case Nil => Nil
        }
        syms = apply(syms)
      }
      syms
    }
    val expect = toy.collect().map { row =>
      val words = row.getAs[String]("text").split(" ").filter(_.nonEmpty)
      (row.getAs[Long]("doc_id"), words.length.toLong,
        words.map(encode(_).length.toLong).sum, words.map(_.length.toLong).sum)
    }.sortBy(_._1).toSeq

    val got = TextFunctions.bpeEncodeWith(toy, merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect, s"encode $got != reference $expect")
    // merged tokens compress: strictly fewer BPE tokens than chars, and
    // at least one per word
    got.foreach { case (_, nWs, nBpe, nChars) =>
      assert(nBpe >= nWs && nBpe < nChars)
    }
  }

  test("pmi: planted collocation outscores independent pairs, marginals reconcile") {
    import spark.implicits._
    // "aa bb" always adjacent (a collocation); "cc"/"dd" co-occur with
    // everything uniformly (no association)
    val planted = Seq.tabulate(20) { i =>
      (i.toLong, s"aa bb cc dd ${if (i % 2 == 0) "cc aa bb" else "dd aa bb"}")
    }.toDF("doc_id", "text")
    val out = TextFunctions.pmiCollocations(planted, minCount = 5).cache()
    val byPair = out.collect()
      .map(r => (r.getAs[String]("word_a"), r.getAs[String]("word_b")) -> r).toMap
    val ab = byPair(("aa", "bb"))
    assert(ab.getAs[Long]("pair_count") === 40L)
    // planted collocation: p(ab) ≫ p(a)p(b) → strongly positive PMI
    assert(ab.getAs[Double]("pmi") > 0.5)
    // unassociated filler pair scores below the collocation
    for (k <- Seq(("bb", "cc"), ("cc", "dd")) if byPair.contains(k))
      assert(byPair(k).getAs[Double]("pmi") < ab.getAs[Double]("pmi"))
    // marginals are corpus unigram counts (aa appears twice per doc)
    assert(ab.getAs[Long]("c_a") === 40L && ab.getAs[Long]("c_b") === 40L)
    // 1-token and empty docs produce no bigrams and don't crash
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(TextFunctions.pmiCollocations(tiny, minCount = 1).count() === 0)
  }

  test("mix divergence: zero on an exact-match mix, positive and bounded off-target") {
    import spark.implicits._
    // 3 en tokens : 1 de token — matches target (0.75, 0.25) exactly
    val planted = Seq(
      (1L, "a b c", "en"), (2L, "d", "de")).toDF("doc_id", "text", "lang")
    val exact = TextFunctions.mixDivergence(planted,
      Map("en" -> 0.75, "de" -> 0.25)).head()
    assert(exact.getAs[Long]("n_langs") === 2L)
    assert(exact.getAs[Double]("kl_nats") === 0.0)
    assert(exact.getAs[Double]("tv_dist") === 0.0)
    // against a flipped target both divergences go positive; TV <= 1
    val off = TextFunctions.mixDivergence(planted,
      Map("en" -> 0.25, "de" -> 0.75)).head()
    assert(off.getAs[Double]("kl_nats") > 0.0)
    assert(off.getAs[Double]("tv_dist") > 0.0 && off.getAs[Double]("tv_dist") <= 1.0)
    // a language missing from the target hits the 1e-6 floor -> large KL
    val missing = TextFunctions.mixDivergence(planted, Map("en" -> 1.0)).head()
    assert(missing.getAs[Double]("kl_nats") > 1.0)
    // a spec'd language entirely ABSENT from the corpus still contributes
    // its TV mass: 100% en corpus vs 50/50 en/zh target -> TV = 0.5,
    // n_langs counts the union
    val absent = TextFunctions.mixDivergence(
      planted.filter(col("lang") === "en"), Map("en" -> 0.5, "zh" -> 0.5)).head()
    assert(absent.getAs[Long]("n_langs") === 2L)
    assert(absent.getAs[Double]("tv_dist") === 0.5)
    assert(!absent.getAs[Double]("kl_nats").isNaN)
  }

  test("zipf fit: planted power law recovers slope -1, r2 near 1") {
    import spark.implicits._
    // word w_i repeated floor(1000/i) times: freq ∝ 1/rank exactly
    val planted = (1 to 50).flatMap { i =>
      Seq.fill(1000 / i)(f"w$i%03d")
    }.grouped(100).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val fit = TextFunctions.zipfFit(planted).head()
    assert(fit.getAs[Long]("n_terms") === 50L)
    assert(math.abs(fit.getAs[Double]("slope") + 1.0) < 0.05,
      s"slope ${fit.getAs[Double]("slope")} not ~ -1")
    assert(fit.getAs[Double]("r2") > 0.99)
    // corpus-health read on real docs: slope negative, r2 in [0, 1]
    val real = TextFunctions.zipfFit(docs).head()
    assert(real.getAs[Double]("slope") < 0.0)
    assert(real.getAs[Double]("r2") >= 0.0 && real.getAs[Double]("r2") <= 1.0)
  }

  test("pii redaction: emails/phones/ips/ids scrubbed and counted") {
    import spark.implicits._
    val planted = Seq(
      (1L, "mail me at jane.doe+x@example.org or call 555-123-4567 now"),
      (2L, "server 192.168.1.100 account 123456789012 ok"),
      (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val out = TextFunctions.redactPii(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("redacted") === "mail me at <EMAIL> or call <PHONE> now")
    assert(out(1L).getAs[Int]("n_emails") === 1 && out(1L).getAs[Int]("n_phones") === 1)
    assert(out(2L).getAs[String]("redacted") === "server <IP> account <NUM> ok")
    assert(out(2L).getAs[Int]("n_ips") === 1 && out(2L).getAs[Int]("n_id_numbers") === 1)
    assert(out(3L).getAs[String]("redacted") === "nothing sensitive here at all")
    assert(out(3L).getAs[Int]("n_emails") === 0)
  }

  test("sequence packing: token mass conserved, packs dense and non-overlapping per lang") {
    val packs = TextFunctions.packSequences(docs, budget = 500).cache()
    val total = packs.agg(sum("pack_tokens")).head().getLong(0)
    val expected = docs
      .select(size(filter(split(lower(col("text")), " "), t => t =!= "")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total === expected, "every token lands in exactly one pack")
    packs.select("lang", "pack_id", "first_doc", "last_doc").collect()
      .groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("pack_id"))
        assert(sorted.map(_.getAs[Long]("pack_id")).head === 0L, s"$lang packs start at 0")
        sorted.sliding(2).filter(_.length == 2).foreach { p =>
          assert(p(0).getAs[Long]("last_doc") < p(1).getAs[Long]("first_doc"),
            s"$lang pack doc spans must not overlap")
        }
      }
  }

  test("heavy hitters: k rows, rank follows (tf desc, token), df <= tf") {
    val hh = TextFunctions.heavyHitters(docs, k = 20).collect()
    assert(hh.length === 20)
    assert(hh.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 20))
    val byRank = hh.sortBy(_.getAs[Int]("rank"))
    byRank.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(0).getAs[Long]("tf") >= p(1).getAs[Long]("tf"))
    }
    assert(hh.forall(r => r.getAs[Long]("df") <= r.getAs[Long]("tf") && r.getAs[Long]("df") > 0))
  }

  test("fingerprint: identical normalized texts get identical fingerprints") {
    import spark.implicits._
    val planted = Seq(
      (1L, "Alpha Beta Gamma Delta Epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val fp = TextFunctions.fingerprint(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(fp(1L).getAs[String]("norm_md5") === fp(2L).getAs[String]("norm_md5"))
    assert(fp(1L).getAs[String]("kgram_min") === fp(2L).getAs[String]("kgram_min"))
    assert(fp(1L).getAs[String]("norm_md5") !== fp(3L).getAs[String]("norm_md5"))
  }

  test("tfidf/bm25: rare terms outscore stopwords, scores positive and deterministic") {
    val scored = TextFunctions.tfidfBm25(docs).cache()
    assert(scored.count() > 0)
    assert(scored.filter(col("bm25") <= 0 || col("tfidf") < 0).count() === 0)
    // a term appearing in every doc has tfidf exactly 0 only if df == n_docs;
    // generally: per doc, the max-bm25 token must be rarer than the median df
    val stats = scored.agg(max("df").as("max_df"), min("df").as("min_df")).head()
    assert(stats.getAs[Long]("max_df") > stats.getAs[Long]("min_df"))
    val top = scored.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("bm25").desc, col("token"))))
      .filter(col("r") === 1)
    val common = scored.groupBy("token").count().orderBy(col("count").desc)
      .limit(1).head().getAs[String]("token")
    // the corpus-wide most common token is never any doc's top-bm25 term
    assert(top.filter(col("token") === common).count() === 0)
  }

  test("multimodal metadata: byte size and checksum over the payload") {
    val m = Multimodal.metadata(docs).cache()
    assert(m.count() === docs.count())
    assert(m.filter(col("byte_size") <= 0).count() === 0)
    assert(m.filter(length(col("checksum")) =!= 32).count() === 0)
    assert(m.filter(length(col("magic_hex")) =!= 8).count() === 0)
  }

  test("multimodal metadata: magic_hex is the first 4 BYTES, not characters") {
    import spark.implicits._
    // 'é' is 2 UTF-8 bytes (c3 a9): byte-based magic of "héllo" = 68 c3 a9 6c
    val m = Multimodal.metadata(Seq((1L, "héllo wörld")).toDF("doc_id", "text")).head()
    assert(m.getAs[String]("magic_hex") === "68c3a96c")
    assert(m.getAs[Long]("byte_size") === 13L)
  }

  test("resize pipeline: aspect preserved, bounded by target, sampling thins frames") {
    val frames = Multimodal.decodeFrames(spark, Multimodal.metadata(docs)).cache()
    val sampled = Multimodal.sampleFrames(frames, everyN = 2)
    assert(sampled.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(sampled.count() < frames.count() || frames.filter(col("frame_idx") > 0).count() === 0)
    val resized = Multimodal.resizeFrames(frames, target = 224).cache()
    assert(resized.count() === frames.count())
    assert(resized.filter(col("out_w") > 224 || col("out_h") > 224).count() === 0)
    // aspect preserved: out ratio within one rounding step of source ratio
    val bad = resized.filter(
      abs(col("out_w") / col("out_h") - col("src_w") / col("src_h")) > 0.05)
    assert(bad.count() === 0, "resize must preserve aspect ratio")
  }

  test("decode plumbing: stub decoder is deterministic and schema-stable") {
    val frames = Multimodal.decodeFrames(spark, Multimodal.metadata(docs), maxFrames = 3).cache()
    assert(frames.count() > 0)
    assert(frames.columns.toSeq === Seq(
      "doc_id", "frame_idx", "width", "height", "n_channels", "frame_checksum"))
    // deterministic across repartitionings (decoder state is per-row pure)
    val a = frames.orderBy("doc_id", "frame_idx").collect()
    val b = Multimodal.decodeFrames(spark,
      Multimodal.metadata(docs).repartition(7), maxFrames = 3)
      .orderBy("doc_id", "frame_idx").collect()
    assert(a.sameElements(b))
    // every frame belongs to a real doc and respects maxFrames
    assert(frames.groupBy("doc_id").count().filter(col("count") > 3).count() === 0)
  }

  test("winnow: shared run >= w+k-1 tokens shares a fingerprint; disjoint docs don't") {
    import spark.implicits._
    // k=4, w=4: guarantee threshold is 7 shared tokens
    val shared = "alpha beta gamma delta epsilon zeta eta" // exactly 7 tokens
    val planted = Seq(
      (1L, s"unrelated prefix one two $shared"),
      (2L, s"$shared completely different tail words here"),
      (3L, "no overlap with anything else at all whatsoever in this document")
    ).toDF("doc_id", "text")
    val fp = TextFunctions.winnow(planted).cache()
    val byDoc = fp.collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[String]("fp_hash")).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "a 7-token shared run spans a full window on both docs -> shared window min")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    assert((byDoc(2L) intersect byDoc(3L)).isEmpty)
    // short docs: under k tokens -> no k-grams -> no rows; k..k+w-2 tokens
    // -> one window over all grams -> exactly one fingerprint
    val short = Seq((10L, "one two three"), (11L, "one two three four five"))
      .toDF("doc_id", "text")
    val sfp = TextFunctions.winnow(short).collect()
    assert(!sfp.exists(_.getAs[Long]("doc_id") == 10L))
    assert(sfp.count(_.getAs[Long]("doc_id") == 11L) === 1)
    // compression: fingerprints per doc ~ m/w, never more than m
    val real = TextFunctions.winnow(docs).groupBy("doc_id").count()
      .join(docs.select(col("doc_id"), size(split(lower(col("text")), " ")).as("n")), "doc_id")
    assert(real.filter(col("count") > col("n")).count() === 0)
  }

  test("temperature mix: shares sum to 1, T<1 upweights low-resource slices, T=1 is identity") {
    val mix = TextFunctions.temperatureMix(docs).cache()
    val sums = mix.agg(sum("token_share"), sum("target_share")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-4)
    // T < 1 flattens: the smallest slice's sampling factor > 1, the
    // largest < 1, and the target ordering preserves the observed one
    val rows = mix.orderBy(col("token_share")).collect()
    assert(rows.head.getAs[Double]("sample_factor") > 1.0)
    assert(rows.last.getAs[Double]("sample_factor") < 1.0)
    assert(rows.map(_.getAs[Double]("target_share")).toSeq === rows.map(_.getAs[Double]("target_share")).sorted.toSeq)
    // T = 1: target == observed (pow(p,1) = p)
    val id = TextFunctions.temperatureMix(docs, temperature = 1.0)
    assert(id.filter(abs(col("target_share") - col("token_share")) > 1e-6).count() === 0)
  }

  test("dsir: target-language docs score higher than off-target, selection = sign of mean") {
    val w = TextFunctions.dsirWeights(docs, targetLang = "en").cache()
    // every doc scored exactly once
    assert(w.count() === docs.count())
    // the target stratum's mean per-token log-ratio must exceed the
    // off-target strata's: the weights recover the planted distinction
    val means = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("logw_per_tok").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} should exceed non-en mean ${means(false)}")
    // selection = above-corpus-mean rule: selects a strict, non-empty
    // subset, and en docs at a higher rate than non-en
    val nSel = w.filter(col("selected") === 1).count()
    assert(nSel > 0 && nSel < w.count(), s"degenerate selection: $nSel")
    val selRate = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("selected").cast("double")).as("r"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(selRate(true) > selRate(false))
    w.unpersist()
    ()
  }

  test("held-out perplexity: hand-computed LM probs, backoff for unseen, OOV floor") {
    import spark.implicits._
    // ref (en): "the cat sat" + "the cat ran"
    //   bigrams: "the cat"×2, "cat sat"×1, "cat ran"×1
    //   prefix marginals: the→2, cat→2 ⇒ p(cat|the)=1, p(sat|cat)=1/2
    //   unigrams: the 2, cat 2, sat 1, ran 1 ⇒ T=6, V=4
    val toy = Seq(
      (1L, "the cat sat", "en"), (2L, "the cat ran", "en"),
      (3L, "le chat", "fr"),        // both tokens OOV
    ).toDF("doc_id", "text", "lang")
    val out = TextFunctions.heldOutPerplexity(toy)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: nll = (−ln 1 − ln 0.5)/2 = 0.34657359… → 0.346574
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") === 2L)
    assert(d1.getAs[Double]("avg_nll") === 0.346574)
    assert(d1.getAs[Double]("ppl") === math.rint(math.exp(0.346574) * 1e4) / 1e4)
    // doc 3: "le chat" unseen bigram, chat OOV → p = 0.4·(0+1)/(6+4) = 0.04
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_bigrams") === 1L)
    assert(d3.getAs[Double]("avg_nll") === math.rint(-math.log(0.04) * 1e6) / 1e6)
    // junk scores WORSE than in-distribution text — the filter's point
    assert(d3.getAs[Double]("ppl") > d1.getAs[Double]("ppl"))
  }

  test("held-out perplexity: seen-unigram backoff beats the OOV floor") {
    import spark.implicits._
    // "sat the": bigram unseen, but both tokens are ref unigrams —
    // p = 0.4·(c(the)+1)/(T+V) = 0.4·3/10 = 0.12 > the 0.04 OOV floor
    val toy = Seq(
      (1L, "the cat sat", "en"), (2L, "the cat ran", "en"),
      (5L, "sat the", "de"), (6L, "zz qq", "de")).toDF("doc_id", "text", "lang")
    val out = TextFunctions.heldOutPerplexity(toy)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(5L).getAs[Double]("avg_nll") === math.rint(-math.log(0.12) * 1e6) / 1e6)
    assert(out(6L).getAs[Double]("avg_nll") === math.rint(-math.log(0.04) * 1e6) / 1e6)
    assert(out(5L).getAs[Double]("ppl") < out(6L).getAs[Double]("ppl"))
  }

  test("chunking: stride-spaced windows cover every token, tail short, singleton for short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than one stride
      (3L, "")                                        // degenerate: split('') = ['']
    ).toDF("doc_id", "text")
    val ch = TextFunctions.chunkDocs(docs, chunkTokens = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        ((r.getAs[Int]("start_tok"), r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text"))))
      .toMap
    // doc 1: starts 0,3,6,9; 4-token windows clamp at the tail
    assert(ch((1L, 0)) === ((0, 4, "w1 w2 w3 w4")))
    assert(ch((1L, 1)) === ((3, 4, "w4 w5 w6 w7")))
    assert(ch((1L, 2)) === ((6, 4, "w7 w8 w9 w10")))
    assert(ch((1L, 3)) === ((9, 1, "w10")))
    // overlap: consecutive windows share chunkTokens - stride = 1 token
    // (asserted above by content); short docs yield exactly one chunk
    assert(ch((2L, 0)) === ((0, 2, "a b")))
    assert(ch((3L, 0)) === ((0, 1, "")))
    assert(ch.size === 6)
    // every token index is covered by some window
    val covered = ch.collect { case ((1L, _), (s, n, _)) => s until (s + n) }.flatten.toSet
    assert(covered === (0 until 10).toSet)
  }
}
