package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * n-gram-heuristic language ID, quality scoring, document fingerprinting.
  * All pure Column expressions (codegen'd, no UDFs) so they run at scan
  * speed over 100 TB of documents and push down through Catalyst.
  */
object TextAnalysis {

  /** whitespace-delimited token count */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword token estimate: words + punctuation marks counted
    * separately (a cheap stand-in for a real tokenizer's token count) */
  def subwordTokenEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]{1,6}|[^a-z0-9\\s]"), lit(0)))

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Language ID heuristic: CJK codepoints dominate → zh; otherwise the
    * stopword family with the strictly-highest hit count wins, with fixed
    * precedence en > de > fr > es on ties. Deterministic and portable to the
    * SQL oracle (same regex counts). */
  def langId(text: Column): Column = {
    val t = lower(text)
    val en = countMatches(t, "\\b(the|and|of|is|to)\\b")
    val de = countMatches(t, "\\b(der|die|und|das|ist)\\b")
    val fr = countMatches(t, "\\b(le|la|les|et|est)\\b")
    val es = countMatches(t, "\\b(el|los|las|es|y)\\b")
    when(countMatches(text, "[\\x{4e00}-\\x{9fff}]") > 0, lit("zh"))
      .when(de > en && de > fr && de > es, lit("de"))
      .when(fr > en && fr > de && fr > es, lit("fr"))
      .when(es > en && es > de && es > fr, lit("es"))
      .otherwise(lit("en"))
  }

  /** Quality score in [0,1]: alnum ratio, length saturation, stopword
    * presence, and a repeated-word penalty — the length/punct/stopword-ratio
    * family of heuristics. Rounded for cross-engine determinism. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alnumRatio = countMatches(text, "[a-zA-Z0-9]").cast("double") / greatest(len, lit(1.0))
    val lenScore = least(len / 500.0, lit(1.0))
    val words = tokenCount(text).cast("double")
    val stopRatio =
      countMatches(lower(text), "\\b(the|and|of|is|to|a|in)\\b").cast("double") /
        greatest(words, lit(1.0))
    val distinctRatio =
      size(array_distinct(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))).cast("double") /
        greatest(words, lit(1.0))
    round(alnumRatio * 0.25 + lenScore * 0.25 +
      least(stopRatio * 5.0, lit(1.0)) * 0.25 + distinctRatio * 0.25, 4)
  }

  /** canonical fingerprint: md5 of lowercased, whitespace-collapsed text */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Unicode hygiene pass every crawled corpus needs before hashing or
    * tokenizing: NFC canonical composition (so "e"+U+0301 and "é" — the
    * same text from different toolchains — hash identically) plus
    * zero-width character removal (ZWSP/ZWNJ/ZWJ/BOM — invisible bytes
    * that silently split tokens and defeat exact dedup). Per-row
    * projection, no shuffle; ICU-free (java.text.Normalizer), mirrored by
    * SQL nfc_normalize. */
  def normalizeUnicode(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC)
        .replaceAll("[\\u200B\\u200C\\u200D\\uFEFF]", ""))
    f(text)
  }

  /** word n-grams WITHOUT dedup (the counting twin of Dedup.wordShingles,
    * which distincts for set similarity) — same per-row-UDF justification:
    * lambda-inlined slicing re-evaluates per element */
  def wordNgrams(wordsColName: String, n: Int): Column = {
    val f = udf((ws: Seq[String]) =>
      if (ws == null || ws.size < n) Seq.empty[String]
      else ws.sliding(n).map(_.mkString(" ")).toSeq)
    f(col(wordsColName))
  }

  /** Repetition statistics — the duplication half of the Gopher filter
    * family: duplicate-line ratio (1 − distinct/total lines, a per-row
    * expression) and the mass of the most frequent word bigram (needs
    * per-ngram counts → one map-side-combined groupBy chain, no self-joins).
    * High values flag boilerplate/spam that per-word stats miss. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val dupLine = df.select(col(idCol),
      (round(lit(1.0) - size(array_distinct(lines)).cast("double") /
        greatest(size(lines), lit(1)).cast("double"), 4) + lit(0.0)).as("dup_line_ratio"))
    val topBigram = df
      .withColumn("_ws", Dedup.wordsArray(textCol))
      .select(col(idCol), explode(wordNgrams("_ws", 2)).as("ng"))
      .groupBy(idCol, "ng").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max("c").as("_top"), sum("c").as("_tot"))
      .select(col(idCol),
        (round(col("_top").cast("double") / col("_tot"), 4) + lit(0.0)).as("top_bigram_frac"))
    dupLine.join(topBigram, Seq(idCol), "left_outer")
      .select(col(idCol), col("dup_line_ratio"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Unigram surprisal — the perplexity-proxy quality filter (CCNet family):
    * mean −ln p(word) per document under the corpus's own unigram model.
    * Low = common/fluent text, high = rare-token soup. The vocab is built
    * in one map-side-combined count and broadcast against the word stream;
    * at real scale the vocab is a stored dim table maintained by the same
    * aggregation (cap it with a min-count to bound the broadcast). */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.withColumn("_ws", Dedup.wordsArray(textCol))
      .select(col(idCol), explode(col("_ws")).as("w"))
    val vocab = words.groupBy("w").agg(count(lit(1)).as("wc"))
    val total = vocab.agg(sum("wc").as("total"))
    words.join(broadcast(vocab), Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("_nlp", -log(col("wc").cast("double") / col("total")))
      .groupBy(idCol)
      .agg((round(avg(col("_nlp")), 4) + lit(0.0)).as("surprisal"))
  }

  /** Interpolated bigram language-model score — the CCNet-family quality
    * filter one order above [[unigramSurprisal]]: per-doc mean −ln p over
    * its bigrams with p = λ·p(w₂|w₁) + (1−λ)·p(w₂), λ = 0.75 (an exact
    * binary fraction, so both engines multiply identically). Low = fluent
    * under the corpus's own bigram statistics; high = rare-transition
    * soup that unigram counts miss (scrambled text scores fluent on
    * unigrams, badly here).
    *
    * Scale shape: the unigram/bigram/context tables are corpus-derived
    * dims joined by key shuffles (never broadcast — the bigram vocabulary
    * is unbounded); the per-doc score is one aggregation. Rounded 1e-4 so
    * float-sum association across engines cannot flip a value. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = df.withColumn("_ws", Dedup.wordsArray(textCol))
    val bg = ws
      .select(col(idCol), explode(wordNgrams("_ws", 2)).as("bgram"))
      .withColumn("w1", expr("split(bgram, ' ')[0]"))
      .withColumn("w2", expr("split(bgram, ' ')[1]"))
    val uni = ws.select(explode(col("_ws")).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cw"))
    val total = uni.agg(sum("cw").as("tot"))
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = bgCounts.groupBy("w1").agg(sum("cb").as("cctx"))
    bg.join(bgCounts, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(uni, Seq("w2"))
      .crossJoin(broadcast(total)) // one row
      .withColumn("_p",
        lit(0.75) * col("cb").cast("double") / col("cctx") +
        lit(0.25) * col("cw").cast("double") / col("tot"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (round(avg(-log(col("_p"))), 4) + 0.0).as("bigram_nll"))
  }

  /** Interpolated Kneser–Ney bigram NLL per document (Kneser & Ney 1995;
    * Chen & Goodman 1998 §2.7 — public): the LM-quality scorer one rung
    * above the interpolated-count model in [[bigramScore]]. Absolute
    * discount D = 0.75 on corpus bigram counts; the discount mass backs
    * off to the CONTINUATION distribution (how many distinct left
    * contexts a word follows), which fixes the "San Francisco problem":
    * words frequent only inside one collocation stop inflating backoff
    * mass.
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + (D · N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/|bigram types|
    *
    * Every quantity is a corpus count, so the whole scorer replays in
    * SQL. Scale shape mirrors [[bigramScore]]: bigram-keyed count
    * shuffles, one broadcast scalar (the type count), one per-doc
    * aggregate — nothing quadratic, nothing driver-side. Scored
    * bigrams always exist in the count tables (the counts come from the
    * same corpus), so c ≥ 1 and p > 0 without smoothing epsilons. */
  def knBigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val D = 0.75
    val ws = df.withColumn("_ws", Dedup.wordsArray(textCol))
    val bg = ws
      .select(col(idCol), explode(wordNgrams("_ws", 2)).as("bgram"))
      .withColumn("w1", expr("split(bgram, ' ')[0]"))
      .withColumn("w2", expr("split(bgram, ' ')[1]"))
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = bgCounts.groupBy("w1")
      .agg(sum("cb").as("cctx"), count(lit(1)).as("n1p_fwd"))
    val cont = bgCounts.groupBy("w2").agg(count(lit(1)).as("n1p_bwd"))
    val types = bgCounts.agg(count(lit(1)).as("ntypes"))
    bg.join(bgCounts, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types)) // one row
      .withColumn("_p",
        greatest(col("cb").cast("double") - lit(D), lit(0.0)) / col("cctx") +
        (lit(D) * col("n1p_fwd").cast("double") / col("cctx")) *
          (col("n1p_bwd").cast("double") / col("ntypes")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (round(avg(-log(col("_p"))), 4) + 0.0).as("kn_nll"))
  }

  /** Gopher-style document quality rules (public heuristics: Rae et al.
    * 2021, "Scaling Language Models", table A1 family) as one struct of
    * per-rule measurements + the overall keep flag:
    *
    *  - word count in [50, 100k]; mean word length in [3, 10]
    *  - symbol-to-word ratio (# and ellipsis) < 0.1
    *  - ≤90% of lines bullet-started; ≤30% ellipsis-ended
    *  - ≥80% of words contain an alphabetic character
    *  - ≥2 distinct common stop words present
    *
    * Pure codegen'd column expressions (counts via regexp_extract_all — no
    * HOF lambdas, which evaluate interpreted). The keep flag is computed
    * from the ROUNDED ratios so engines agree at rule boundaries. */
  def gopherRules(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val meanWordLen = round(
      length(regexp_replace(text, "\\s", "")).cast("double") /
        greatest(words, lit(1.0)), 4) + lit(0.0)
    val symbolRatio = round(
      (countMatches(text, "#") + countMatches(text, "\\.\\.\\.")).cast("double") /
        greatest(words, lit(1.0)), 4) + lit(0.0)
    val lines = size(split(text, "\n")).cast("double")
    val bulletRatio = round(
      countMatches(text, "(?m)^\\s*[-*•]").cast("double") /
        greatest(lines, lit(1.0)), 4) + lit(0.0)
    val ellipsisRatio = round(
      countMatches(text, "(?m)(\\.\\.\\.|…)$").cast("double") /
        greatest(lines, lit(1.0)), 4) + lit(0.0)
    val alphaRatio = round(
      countMatches(text, "\\S*[A-Za-z]\\S*").cast("double") /
        greatest(words, lit(1.0)), 4) + lit(0.0)
    val nStop = size(array_distinct(regexp_extract_all(lower(text),
      lit("\\b(the|be|to|of|and|that|have|with)\\b"), lit(0)))).cast("long")
    val keep = words >= 50 && words <= 100000 &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio < 0.1 && bulletRatio <= 0.9 && ellipsisRatio <= 0.3 &&
      alphaRatio >= 0.8 && nStop >= 2
    struct(
      words.cast("long").as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"),
      alphaRatio.as("alpha_word_ratio"),
      nStop.as("n_stopwords"),
      keep.as("keep"))
  }

  /** Character-level Shannon entropy (bits/char) — the compressibility
    * proxy quality filters use to catch boilerplate and keyboard-mash:
    * low entropy = repetitive template text, implausibly high = random
    * noise. Single-pass per-row UDF (the measured-win pattern used for
    * shingles/simhash: an explode+groupBy twin would shuffle |text| rows
    * per document for a per-document scalar); the SQL oracle computes the
    * same sum via unnest+group. Deterministic double math, rounded at 4. */
  def charEntropy(text: Column): Column = {
    val f = udf((t: String) => {
      if (t == null || t.isEmpty) 0.0
      else {
        val counts = new java.util.HashMap[Char, Long]()
        var i = 0
        while (i < t.length) {
          counts.merge(t.charAt(i), 1L, (a, b) => a + b); i += 1
        }
        val n = t.length.toDouble
        var h = 0.0
        counts.forEach { (_, c) =>
          val p = c / n
          h -= p * (math.log(p) / math.log(2.0))
        }
        math.rint(h * 10000) / 10000
      }
    })
    f(text)
  }

  /** PII scrubbing for training corpora: emails, long digit runs (phone/IDs)
    * and bare IPv4s replaced with typed placeholders. Pure regexp_replace
    * chain — runs at scan speed and pushes through Catalyst. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUMBER>")
  }

  /** deterministic train/val/test split from the portable content hash:
    * stable across runs/engines, independent of row order — the property a
    * reproducible corpus split needs (80/10/10) */
  def hashSplit(key: Column): Column = {
    val h = pmod(Dedup.hash60(key), lit(100L))
    when(h < 80, lit("train")).when(h < 90, lit("val")).otherwise(lit("test"))
  }

  /** winnowing parameters: k-gram rolling hash, window of W minima */
  val WinnowK = 8
  val WinnowWindow = 4
  val WinnowBase = 31L
  val WinnowMod = 2147483647L

  /** Winnowing document fingerprints (rolling Rabin-Karp hashes over
    * character k-grams, then the minimum of each W-length hash window —
    * the classic near-dup/plagiarism fingerprint). Exact integer
    * arithmetic, so the SQL oracle reproduces it bit-for-bit. Emits the
    * distinct selected fingerprints as a sorted array. */
  def winnowFingerprints(text: Column): Column = {
    val k = WinnowK; val w = WinnowWindow; val b = WinnowBase; val m = WinnowMod
    val f = udf((t: String) => {
      // hash CODEPOINTS, not UTF-16 units — the SQL oracle's ord() and
      // Spark's length() both count codepoints, so supplementary-plane
      // characters must not desync the two sides
      val s = Option(t).getOrElse("").codePoints().toArray
      if (s.length < k) Seq.empty[Long]
      else {
        // rolling hash: h(i+1) = ((h(i) - c_i·B^(k-1))·B + c_{i+k}) mod M
        val pow = { var p = 1L; for (_ <- 1 until k) p = p * b % m; p }
        val hs = new Array[Long](s.length - k + 1)
        var h = 0L
        for (j <- 0 until k) h = (h * b + s(j).toLong) % m
        hs(0) = h
        for (i <- 1 until hs.length) {
          h = ((h - s(i - 1).toLong * pow % m + m * b) % m * b +
            s(i + k - 1).toLong) % m
          hs(i) = h
        }
        if (hs.length < w) Seq(hs.min)
        else (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct.sorted
      }
    })
    f(text)
  }

  /** Heavy-hitter tokens (count >= `minCount`) without a full-vocabulary
    * shuffle — the two-pass candidates-then-verify pattern for frequency
    * questions over a 100 TB token stream:
    *
    *  - pass 1: each partition runs a bounded Misra–Gries summary
    *    (capacity-k map; Misra & Gries 1982 — public) over its own tokens
    *    and emits only entries whose summary count PLUS the exact
    *    undercount cap (d = decrement rounds taken) clears the
    *    per-partition threshold ceil(minCount/P). Pigeonhole: a globally-
    *    heavy token is locally heavy in >= 1 partition, and MG undercounts
    *    by at most d, so the emitted union is a GUARANTEED superset of the
    *    true heavy hitters — PROVIDED d stays below the threshold. When it
    *    doesn't (capacity too small for the partition's token volume: a
    *    heavy token may have been evicted outright), the summary cannot
    *    certify absence and the pass FAILS LOUDLY rather than silently
    *    dropping hitters — size capacity >= n_p/tau_p (default 65536
    *    certifies ~65M tokens/partition at tau_p=1000). Driver traffic is
    *    O(P × capacity) candidate strings, not the vocabulary.
    *  - pass 2: exact counts for candidate tokens only — the broadcast
    *    isin filter pushes to the scan, and map-side partial aggregation
    *    collapses each partition's candidate rows to <= |candidates|
    *    before the (tiny) shuffle. Output is EXACT, so the oracle is the
    *    plain HAVING-count query.
    *
    * The token stream is evaluated once per pass (two scan-speed passes;
    * a cache would trade memory for the second scan). `mapPartitions` is
    * justified per SURVEY §2.11(d): the MG summary is genuinely per-
    * partition imperative state no Column expression composes. */
  def heavyHitterTokens(df: DataFrame, textCol: String, minCount: Long,
                        capacity: Int = 1 << 16): DataFrame = {
    require(minCount >= 1 && capacity >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(Dedup.wordsArray(textCol)).as("w")).as[String]
    val nPart = math.max(words.rdd.getNumPartitions, 1)
    val tauP = math.max(1L, math.ceil(minCount.toDouble / nPart).toLong)
    val candidates = words.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      var d = 0L // decrement rounds taken = exact per-token undercount cap
      it.foreach { w =>
        if (m.containsKey(w)) m.put(w, m.get(w) + 1L)
        else if (m.size < capacity) m.put(w, 1L)
        else { // classic MG: a full-map miss decrements every entry instead
          d += 1
          val itr = m.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      if (d >= tauP) throw new IllegalStateException(
        s"heavyHitterTokens: MG capacity $capacity exhausted ($d decrement " +
          s"rounds >= per-partition threshold $tauP) — an evicted token " +
          s"could be a true heavy hitter; raise capacity above " +
          s"partitionTokens/$tauP")
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala.collect {
        case e if e.getValue + d >= tauP => e.getKey
      }
    }.distinct().collect().toSeq
    if (candidates.isEmpty)
      spark.emptyDataset[(String, Long)].toDF("w", "cnt")
    else
      words.toDF("w")
        .filter(col("w").isInCollection(candidates))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
  }

  /** Crawl-frontier URL canonicalization — the normalization every web
    * pipeline applies before URL-level dedup: lowercase scheme + host,
    * strip default ports (http:80 / https:443), drop the fragment, drop
    * tracking parameters (utm_*, fbclid, gclid), SORT the surviving
    * query parameters, drop an empty query, and strip a trailing slash
    * from non-root paths. Pure function (map-side; no shuffle until the
    * group-by on the canonical key). */
  def canonicalUrl(url: String): String = {
    if (url == null) return null
    val noFrag = url.split("#", 2)(0)
    val (prefix, query) = noFrag.split("\\?", 2) match {
      case Array(p, q) => (p, q)
      case Array(p) => (p, "")
    }
    val schemeEnd = prefix.indexOf("://")
    val (scheme, rest) =
      if (schemeEnd < 0) ("http", prefix)
      else (prefix.substring(0, schemeEnd).toLowerCase,
        prefix.substring(schemeEnd + 3))
    val slash = rest.indexOf('/')
    val (hostPort, path0) =
      if (slash < 0) (rest, "") else (rest.substring(0, slash), rest.substring(slash))
    val host = hostPort.toLowerCase match {
      case h if scheme == "http" && h.endsWith(":80") => h.dropRight(3)
      case h if scheme == "https" && h.endsWith(":443") => h.dropRight(4)
      case h => h
    }
    val path =
      if (path0.length > 1 && path0.endsWith("/")) path0.dropRight(1)
      else path0
    val params = query.split("&").filter(_.nonEmpty).filterNot { kv =>
      val k = kv.split("=", 2)(0).toLowerCase
      k.startsWith("utm_") || k == "fbclid" || k == "gclid"
    }.sorted
    s"$scheme://$host$path" +
      (if (params.isEmpty) "" else params.mkString("?", "&", ""))
  }
}
