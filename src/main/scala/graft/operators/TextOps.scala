package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language ID, fingerprinting.
 *
 * Everything here is built from codegen'd `org.apache.spark.sql
 * .functions` (no UDFs on the hot path) and — deliberately — from
 * constructs whose semantics are identical in ANSI SQL engines, so the
 * DuckDB oracle can mirror each formula exactly (integer arithmetic,
 * length/replace counting, md5).
 */
object TextOps {
  /** token split pattern: runs of non-alphanumerics (same semantics in
   *  Java regex and RE2). */
  val TokenPattern = "[^a-zA-Z0-9]+"

  /** non-empty alphanumeric tokens — a codegen'd single byte-scan
   *  (`spark/AsciiTokens.scala`) replacing `filter(split(regex))`,
   *  which paid a regex pass plus one interpreted lambda eval per
   *  token per document on EVERY text operator's first stage.
   *  Spec-asserted bit-equal to the regex pipeline (incl. unicode). */
  def tokens(c: Column): Column =
    org.apache.spark.sql.graft.AsciiTokens.asColumn(c)

  /** The pre-r11 regex+HOF form of [[tokens]] — kept as the
   *  equivalence oracle for the codegen expression (OperatorsSpec). */
  private[graft] def tokensRegex(c: Column): Column =
    filter(split(c, TokenPattern), t => t =!= lit(""))

  /** Fused `tokens(normalize(c))` — lowercased tokens in ONE byte scan
   *  (no regex at all); spec-asserted bit-equal to the composed
   *  pipeline. The dedup family's first corpus stage. */
  def normTokens(c: Column): Column =
    org.apache.spark.sql.graft.AsciiTokens.normColumn(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** ASCII whitespace spelled as an explicit class, NOT `\s`: Java's
   *  `\s` includes vertical tab (\x0B) while RE2's does not, so a `\s`
   *  on both sides would make Spark and the DuckDB oracle tokenize text
   *  containing \x0B differently. The explicit class means both engines
   *  see the identical set. */
  val WsClass = " \\t\\n\\x0B\\f\\r"

  /** whitespace-delimited word count */
  def wordCount(c: Column): Column =
    size(filter(split(c, s"[$WsClass]+"), t => t =!= lit("")))

  /** GPT-2-style pretokenizer pattern, restricted to constructs with
   *  identical semantics in Java regex and RE2 (no lookahead, explicit
   *  ASCII classes — see WsClass): contraction suffixes, space-prefixed
   *  letter/digit runs, space-prefixed punctuation runs, whitespace
   *  runs. */
  val BpePattern =
    s"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^${WsClass}A-Za-z0-9]+|[$WsClass]+"

  /** BPE-ish token count: number of pretokenizer matches — the unit a
   *  byte-pair encoder would split further. Counts MATCHES (not
   *  delimited fields), so the SQL mirror is len(regexp_extract_all). */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** occurrences of literal `s` via the length/replace trick — exactly
   *  mirrorable in SQL: (len(c) - len(replace(c, s, ''))) / len(s). */
  def occurrences(c: Column, s: String): Column =
    (length(c) - length(replace(c, lit(s), lit("")))) / lit(s.length)

  /** punctuation count (needs the 'g' flag in DuckDB's regexp_replace) */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", ""))

  private def padded(c: Column): Column = concat(lit(" "), c, lit(" "))

  /** stopword-hit count over a word list (words matched with spaces
   *  around them on a padded copy of the text). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    words.map(w => occurrences(padded(c), s" $w ")).reduce(_ + _)

  val EnStop = Seq("the", "a", "of", "to", "and", "in", "is")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht")
  val FrStop = Seq("le", "la", "les", "et", "est", "une")
  val EsStop = Seq("el", "los", "las", "y", "es", "una")

  /**
   * N-gram-heuristic language ID: argmax of per-language stopword hit
   * counts, deterministic tiebreak in declaration order
   * (en > de > fr > es > unknown). Pure integer arithmetic — the SQL
   * oracle reproduces it bit-for-bit.
   */
  def langId(c: Column): Column = {
    val en = stopwordHits(c, EnStop)
    val de = stopwordHits(c, DeStop)
    val fr = stopwordHits(c, FrStop)
    val es = stopwordHits(c, EsStop)
    val mx = greatest(en, de, fr, es)
    when(mx === 0, lit("unknown"))
      .when(en === mx, lit("en"))
      .when(de === mx, lit("de"))
      .when(fr === mx, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Quality score in [0, 1000]: rewards length and stopword density,
   * penalizes punctuation runs and very short docs. Integer arithmetic
   * only (DIV), so Spark and the oracle agree exactly.
   */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c).cast("long")
    val stop = stopwordHits(c, EnStop).cast("long")
    val punct = punctCount(c).cast("long")
    // floor(len/10) == len//10 for non-negative lengths; exact in double
    val lenTerm = floor(length(c).cast("long") / lit(10L)).cast("long")
    val raw = lit(2L) * toks + lit(10L) * stop - lit(5L) * punct + lenTerm
    greatest(lit(0L), least(lit(1000L), raw))
  }

  /** normalized text: collapse non-alphanumerics to single spaces,
   *  lowercase, trim — one codegen'd byte scan
   *  (`spark/AsciiTokens.scala`), spec-asserted bit-equal to the
   *  regex pipeline it replaced. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.graft.AsciiNormalize.asColumn(c)

  /** The pre-r11 regex form of [[normalize]] — kept as the equivalence
   *  oracle for the codegen expression (OperatorsSpec). */
  private[graft] def normalizeRegex(c: Column): Column =
    trim(lower(regexp_replace(c, TokenPattern, " ")))

  /** document fingerprint = md5 of the normalized text (md5 is
   *  byte-identical across engines). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /**
   * Rolling polynomial (Karp-Rabin) 64-bit fingerprint over normalized
   * bytes: fp = sum(byte_i * 31^i) in wrapping Long arithmetic.
   * Implemented with aggregate() over the byte array — stays inside
   * whole-stage codegen, no UDF.
   */
  def rollingHash(c: Column): Column =
    aggregate(
      // string -> byte array -> Seq of longs
      transform(split(normalize(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, b) => acc * lit(31L) + b)

  /** 64-bit SimHash over token xxhash64 values: per-bit majority vote.
   *  (Weighted variant of Charikar's simhash; deterministic.) */
  def simhash64(c: Column): Column =
    // codegen'd SimhashFp (spark/TextHashExpressions.scala): one pass
    // replacing an INTERPRETED transform lambda + boxed UDF; same
    // xxhash64(seed 42) per token, same majority vote; coalesce
    // restores the UDF's null→0L convention
    coalesce(org.apache.spark.sql.graft.SimhashFp.asColumn(tokens(c)),
      lit(0L))

  /** The pre-r11 transform+UDF form of [[simhash64]] — kept as the
   *  equivalence oracle for the codegen expression (OperatorsSpec). */
  private[graft] def simhash64Udf(c: Column): Column = {
    val hashes = transform(tokens(c), t => xxhash64(t))
    val simhashUdf = udf((hs: Seq[Long]) => {
      if (hs == null || hs.isEmpty) 0L
      else {
        val votes = new Array[Int](64)
        hs.foreach { h =>
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    })
    simhashUdf(hashes)
  }

  /** Hamming distance between two 64-bit simhashes (bit_count is
   *  codegen'd). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Token n-grams joined with single spaces (the decontamination
   *  unit): windows over [[tokens]], empty array when the doc has
   *  fewer than `n` tokens. Native expression
   *  (`org.apache.spark.sql.graft.TokenNgrams`) rather than
   *  `transform(sequence, i -> concat_ws(slice))`: the lambda inlines
   *  the token subtree per POSITION, re-splitting the text once per
   *  window (measured 3.5x the entry runtime; quadratic in doc
   *  length), where the unary expression evaluates the token array
   *  exactly once per row. */
  def tokenNgrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.TokenNgrams.asColumn(tokens(c), n)

  // ---- PII redaction ----------------------------------------------------
  // Patterns restricted to the Java∩RE2 common subset (explicit ASCII
  // classes, non-capturing groups, greedy quantifiers, no lookaround or
  // backreferences) so Spark and the DuckDB oracle match identically.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "(?:\\+[0-9]{1,2} )?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** number of matches of a PII pattern (group 0 = whole match) */
  def piiMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact emails, then IPv4s, then phone numbers to typed tokens.
   *  Order matters: the email local part may contain dotted digit runs
   *  an IP pattern would claim, so emails go first; the replacement
   *  tokens contain no digits/dots/dashes, so later passes cannot match
   *  inside earlier redactions. All three are codegen'd
   *  `regexp_replace` — no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  // ---- Gopher-style repetition / quality rules --------------------------

  /** milli-fraction with a zero-denominator guard; floor(double) so the
   *  DuckDB mirror (`FLOOR(1000.0 * n / d)`) computes the identical
   *  IEEE value. */
  private def milli(num: Column, den: Column): Column =
    when(den === 0, lit(0L))
      .otherwise(floor(lit(1000.0) * num / den)).cast("long")

  /**
   * Repetition and quality signals per document, after the Gopher
   * filter rules (Rae et al. 2021, "Scaling Language Models", table
   * A1): word count and mean word length, symbol-to-word ratio
   * (# and ellipsis), bullet-started and ellipsis-ended line
   * fractions, duplicate-line fraction (by occurrence and by
   * character mass), and the character fraction of the most frequent
   * word 2-gram. `gopher_keep` applies the paper's thresholds.
   *
   * All fractions are floor-milli integers so the DuckDB oracle is
   * hash-exact. Shape at scale: line and 2-gram stats explode and
   * re-aggregate keyed by (doc_id, value) — distributed by content,
   * never a per-doc in-memory map; the three per-doc aggregates join
   * 1:1 on doc_id. A 10-million-line document costs its row count,
   * not its row count squared.
   */
  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // ONE corpus scan: lines and word 2-grams ride the same Generate as
    // tagged structs (a naive three-branch plan re-reads the text
    // column three times — at 100 TB that is 3 corpus scans). The
    // token-level scalars (words, word chars, '#', '...') are summed
    // from per-LINE counts: none of those constructs can span a
    // newline, so per-line totals equal whole-text totals; 2-grams CAN
    // span lines (tokens split on any non-alphanumeric), so they
    // explode from the full text. Every doc has >= 1 line, so the
    // final doc_id aggregate retains all rows.
    val lineStructs = transform(split(col("text"), "\n"),
      l => struct(lit(0).as("kind"), l.as("v")))
    val gramStructs = transform(tokenNgrams(col("text"), 2),
      g => struct(lit(1).as("kind"), g.as("v")))
    val ex = base.select(col("doc_id"),
        explode(concat(lineStructs, gramStructs)).as("e"))
      .select(col("doc_id"), col("e.kind").as("kind"), col("e.v").as("v"))
    // value-level dedup: one row per (doc, kind, value) with its count —
    // the shuffle is keyed by content, so a 10-million-line document
    // spreads over the cluster instead of pinning one task
    val grp = ex.groupBy(col("doc_id"), col("kind"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val lineWords = filter(split(col("v"), s"[$WsClass]+"), t => t =!= lit(""))
    val m = grp.select(col("doc_id"), col("kind"), col("cnt"),
      length(col("v")).as("vlen"),
      when(col("kind") === 0, size(lineWords).cast("long"))
        .otherwise(0L).as("lwords"),
      when(col("kind") === 0,
        aggregate(lineWords, lit(0L), (acc, x) => acc + length(x)))
        .otherwise(0L).as("lchars"),
      when(col("kind") === 0, (length(col("v")) -
        length(replace(col("v"), lit("#"), lit("")))).cast("long"))
        .otherwise(0L).as("lhash"),
      when(col("kind") === 0, ((length(col("v")) -
        length(replace(col("v"), lit("..."), lit("")))) / lit(3)).cast("long"))
        .otherwise(0L).as("lell"),
      when(col("kind") === 0 && (ltrim(col("v")).startsWith("-") ||
        ltrim(col("v")).startsWith("*")), lit(1L)).otherwise(0L).as("bullet"),
      when(col("kind") === 0 && rtrim(col("v")).endsWith("..."), lit(1L))
        .otherwise(0L).as("ell"))
    val isLine = col("kind") === 0
    val stats = m.groupBy("doc_id").agg(
      sum(when(isLine, col("cnt")).otherwise(0L)).as("n_lines"),
      sum(when(isLine, col("cnt") - 1).otherwise(0L)).as("dup_occ"),
      sum(when(isLine, col("cnt") * col("vlen")).otherwise(0L)).as("line_chars"),
      sum(when(isLine, (col("cnt") - 1) * col("vlen")).otherwise(0L)).as("dup_chars"),
      sum(col("cnt") * col("bullet")).as("bullet_lines"),
      sum(col("cnt") * col("ell")).as("ellipsis_lines"),
      sum(col("cnt") * col("lwords")).as("n_words"),
      sum(col("cnt") * col("lchars")).as("tok_chars"),
      sum(col("cnt") * col("lhash")).as("n_hash"),
      sum(col("cnt") * col("lell")).as("n_ellipsis"),
      max(when(col("kind") === 1, col("cnt") * (col("vlen") - 1)))
        .as("top2_chars"))
    val meanLen = milli(col("tok_chars"), col("n_words"))
    val symbol = milli(col("n_hash") + col("n_ellipsis"), col("n_words"))
    val bullet = milli(col("bullet_lines"), col("n_lines"))
    val ellip = milli(col("ellipsis_lines"), col("n_lines"))
    val dupLine = milli(col("dup_occ"), col("n_lines"))
    val dupChar = milli(col("dup_chars"), col("line_chars"))
    val top2 = when(col("top2_chars").isNull, lit(0L))
      .otherwise(milli(col("top2_chars"), col("tok_chars")))
    stats
      .select(col("doc_id"), col("n_words"),
        meanLen.as("mean_word_len_milli"),
        symbol.as("symbol_ratio_milli"),
        bullet.as("bullet_frac_milli"),
        ellip.as("ellipsis_frac_milli"),
        dupLine.as("dup_line_frac_milli"),
        dupChar.as("dup_line_char_frac_milli"),
        top2.as("top2gram_char_frac_milli"))
      .withColumn("gopher_keep",
        when(col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len_milli") >= 3000 &&
          col("mean_word_len_milli") <= 10000 &&
          col("symbol_ratio_milli") < 100 &&
          col("bullet_frac_milli") < 900 &&
          col("ellipsis_frac_milli") < 300 &&
          col("dup_line_frac_milli") < 300 &&
          col("dup_line_char_frac_milli") < 200 &&
          col("top2gram_char_frac_milli") < 200, lit(1L)).otherwise(0L))
  }

  /**
   * Corpus vocabulary: the top-k tokens of `lower(text)` by frequency,
   * deterministic tie-break (count desc, then token asc), dense
   * 1-based ids — the first step of any tokenizer-training or
   * frequency-filtering pass. The heavy stage is the distributed token
   * count (explode + groupBy token, with map-side partial
   * aggregation); the top-k runs as `TakeOrderedAndProject` —
   * per-partition heaps of size k, never a global sort — and only the
   * k survivors see the row_number window (a single tiny partition by
   * construction).
   */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = df
      .select(explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(k)
    counts.withColumn("vocab_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("token").asc))
          .cast("long"))
      .select(col("vocab_id"), col("token"), col("cnt"))
  }

  /**
   * φ-heavy hitters over token n-grams — every gram whose occurrence
   * count is ≥ `phiPermille`‰ of all gram occurrences, with EXACT
   * counts — via a count-min-sketch shortlist:
   *
   *  pass 1 builds a depth×width CMS distributively: each occurrence
   *  maps to one bucket per depth row (codegen'd xxhash64), and the
   *  groupBy shuffles at most depth×width CELLS — thousands of rows —
   *  instead of one row per distinct gram. Only the sketch (a few
   *  hundred KB) reaches the driver; the occurrence total falls out of
   *  it for free (every row of the sketch sums to it).
   *
   *  pass 2 re-scans occurrences and keeps those whose sketch estimate
   *  (min over depth rows, a literal-array lookup — no UDF) reaches
   *  the threshold. CMS never underestimates, so every TRUE heavy
   *  hitter survives — full recall by construction; false positives
   *  (hash collisions) are killed by the exact groupBy + HAVING that
   *  runs over the surviving sliver only.
   *
   * At 100 TB this is the difference between shuffling billions of
   * distinct grams (the exact-groupBy-everything plan) and shuffling a
   * fixed-size sketch plus the heavy tail — the same
   * summarize-then-verify discipline as the Bloom dedup path.
   */
  def heavyHitters(df: DataFrame, textCol: String, n: Int,
      phiPermille: Long, depth: Int = 4, width: Int = 8192): DataFrame = {
    require(depth >= 1 && width >= 1 && phiPermille >= 1)
    val toks = tokens(lower(col(textCol)))
    val gramCol =
      if (n == 1) toks
      else org.apache.spark.sql.graft.TokenNgrams.asColumn(toks, n)
    val occ = df.select(explode(gramCol).as("gram"))
    def bucket(d: Int): Column =
      pmod(xxhash64(lit(d), col("gram")), lit(width)).cast("int")
    val cells = occ.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d).as("b"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.b").as("b"))
      .agg(count(lit(1)).as("n")).collect()
    val sketch = Array.fill(depth)(new Array[Long](width))
    cells.foreach(r => sketch(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val total = sketch(0).sum
    val threshold = math.max(1L, total * phiPermille / 1000L)
    val est = (0 until depth).map(d =>
      element_at(typedlit(sketch(d).toSeq), bucket(d) + 1))
      .reduce(least(_, _))
    occ.where(est >= threshold)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }

  /** Deterministic per-row sampling key in [0, 1000): multiplicative
   *  hashing in plain BIGINT arithmetic — `((id % 1000003) * 2654435761)
   *  % 1000`. Deliberately NOT an engine hash builtin (Spark's xxhash64
   *  and DuckDB's hash differ), so the sample is reproducible across
   *  engines, runs, and partitionings; the pre-modulus keeps the
   *  product overflow-safe under ANSI. */
  def sampleKey(idCol: Column): Column =
    ((idCol % 1000003L) * 2654435761L) % 1000L

  /**
   * Quota (mixture) sampling — the training-mixture reweighting step:
   * each class (language, source, domain) keeps `quotaPermille` of its
   * documents, chosen by the deterministic [[sampleKey]], so the
   * sample is stable under re-runs and needs no global count or sort.
   * Pure per-row predicate: no shuffle, pushes down to the scan.
   */
  def quotaSample(df: DataFrame, idCol: String, classCol: String,
      quotaPermille: Map[String, Long], defaultPermille: Long): DataFrame = {
    val quota = quotaPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
        when(col(classCol) === k, lit(v)).otherwise(acc)
      }
    df.withColumn("sample_key", sampleKey(col(idCol)))
      .withColumn("quota_permille", quota)
      .where(col("sample_key") < col("quota_permille"))
  }

  /**
   * Exact-count stratified sampling: exactly min(k, |stratum|) rows
   * per class, chosen by the deterministic [[sampleKey]] rank with id
   * as the tie-break — the "n documents per language/source" shape a
   * published training mixture specifies, where [[quotaSample]]'s
   * per-row rate predicate can only hit a budget in expectation.
   * One exchange keyed by class; ranking is per-stratum, never a
   * global sort. A skewed stratum funnels through one task at 100 TB —
   * pre-thin it with [[quotaSample]] to ~10x the budget first (rate =
   * 10k/|stratum|), which preserves the final ranked selection because
   * the rate gate and the rank order use the SAME key.
   */
  def stratifiedSample(df: DataFrame, idCol: String, classCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(sampleKey(col(idCol)).asc, col(idCol).asc)
    df.withColumn("strat_rank", row_number().over(w).cast("long"))
      .where(col("strat_rank") <= k)
  }

  /**
   * Concat-and-chunk training-sequence packing: documents within a
   * shard, in id order, are laid head-to-tail and cut into fixed
   * `seqLen` token windows. Emits where each document lands —
   * `pack_id` (the window its first token falls in), `pack_offset`
   * (position inside that window) and `n_splits` (how many window
   * boundaries the document straddles). The cumulative sum is a window
   * per SHARD (`shardCol`), so the work distributes across shards —
   * the global-order variant would serialize the whole corpus through
   * one task, which is exactly how real pipelines end up packing per
   * input shard anyway. Token counts use the BPE-ish pretokenizer
   * (see [[bpeTokenCount]]).
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqLen: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(shardCol),
        bpeTokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // pure BIGINT arithmetic end-to-end: DIV, not `/`-then-cast — the
      // double detour survives powers of two (seqLen=2048 divides
      // exactly) but is a latent boundary hazard for any other seqLen,
      // and keeping both engines on integer ops removes the class
      .select(col(idCol), col(shardCol), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $seqLen").as("pack_id"),
        (col("cum") - col("n_tokens")) % lit(seqLen.toLong) as "pack_offset",
        when(col("n_tokens") > 0,
          expr(s"(cum - 1) DIV $seqLen") -
            expr(s"(cum - n_tokens) DIV $seqLen"))
          .otherwise(0L).as("n_splits"))
  }

  /**
   * CCNet-style corpus-frequency bucketing (Wenzek et al.: split a
   * crawl into head/middle/tail by LM perplexity; the open-source
   * pipeline's defining filter). With no LM in this environment the
   * perplexity proxy is the corpus itself: a document whose tokens are
   * corpus-COMMON scores like low-perplexity text, one built of rare
   * tokens like tail text. All arithmetic is integer-exact:
   *
   *   score(doc)  = (Σ corpusCount(token) * 1000) DIV n_tokens
   *   corpus ref  = (Σ c² * 1000) DIV (Σ c)   (the same average taken
   *                 over every token OCCURRENCE in the corpus)
   *   head   if score ≥ ref; tail if 2·score < ref; else middle.
   *
   * Fixed corpus-relative cutoffs instead of ntile terciles ON PURPOSE:
   * terciles need a global sort of all documents, the scalar reference
   * broadcasts. Scale shape: pass 1 is word-count (map-side combine,
   * one exchange); pass 2 re-tokenizes and joins counts on token (one
   * exchange) and folds per doc. Two corpus passes total, no global
   * ordering anywhere.
   */
  def ccnetBucket(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("token"))
    val cnt = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val ref = cnt.agg(sum(col("c") * col("c")), sum(col("c"))).head()
    val refMilli = ref.getLong(0) * 1000L / ref.getLong(1)
    tok.join(cnt, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n_tokens"))
      .withColumn("avg_count_milli", expr("(sum_c * 1000) DIV n_tokens"))
      .withColumn("bucket",
        when(col("avg_count_milli") >= refMilli, "head")
          .when(col("avg_count_milli") * 2 < refMilli, "tail")
          .otherwise("middle"))
      .select(col("doc_id"), col("n_tokens"), col("avg_count_milli"),
        col("bucket"))
  }

  /**
   * Overlapping fixed-window document chunking — the retrieval/RAG unit
   * prep complement of [[packSequences]]: packing concatenates documents
   * into training sequences, chunking cuts EACH document independently
   * into `winSize`-token windows whose starts advance by `stride`
   * (stride < winSize ⇒ overlap, so no boundary loses context); the
   * last window keeps the shorter tail. Emits one row per chunk with a
   * content digest — the join key for downstream embedding/dedup of the
   * chunk corpus.
   *
   * Scale shape: a pure per-row `explode` over a token-start sequence —
   * ZERO shuffle at any corpus size, output bounded by
   * ceil(tokens/stride) rows per document, and the token array is built
   * once per document (the explode carries only the start offsets, the
   * slice happens against the one array). 100 TB of documents chunk at
   * scan speed, partition-parallel.
   */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      winSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && winSize >= stride,
      s"need 0 < stride <= winSize, got winSize=$winSize stride=$stride")
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("_toks"))
      .withColumn("_n", size(col("_toks")))
      // starts 0, stride, 2*stride, ... while start < n_tokens
      .withColumn("chunk_id",
        explode(expr(s"sequence(0, (_n - 1) DIV $stride)")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        least(lit(winSize.toLong),
          col("_n").cast("long") - col("chunk_id") * stride)
          .as("chunk_tokens"),
        md5(array_join(
          slice(col("_toks"), col("chunk_id") * stride + 1, lit(winSize)), " "))
          .as("chunk_md5"))
  }

  /**
   * BM25 relevance of every document against a fixed query-term list —
   * the corpus-ranking primitive behind retrieval-based data curation
   * (select pretraining documents similar to a high-quality seed set).
   *
   * Engine-portable scoring: the usual `ln` idf is replaced by its
   * rational core (N - df + 0.5)/(df + 0.5) — the same monotone
   * ranking — so the whole score is a FIXED dag of IEEE double ops
   * (adds/multiplies/divides of integer-derived values) that DuckDB
   * evaluates bit-identically; the per-term scores sum in declared
   * term order, because FP addition order is part of the cross-engine
   * contract. Constants (k1 = 1.2, b = 0.75, 2.2, 0.25) appear as
   * source literals on BOTH sides, never derived arithmetic, so the
   * doubles agree exactly.
   *
   * Scale shape: pass 1 aggregates (N, sum dl, per-term df) — one scan
   * into a handful of longs; pass 2 scores and TakeOrders the top N.
   * tf/dl come from the same tokenization both passes; no shuffle ever
   * carries more than the aggregate row and the top-N heap.
   */
  /**
   * Hashed linear quality classifier — the model-based quality-filter
   * shape (fastText/DCLM-style "educational value" scoring) with a
   * deterministic stand-in for the trained weights: each token hashes
   * to one of `dim` buckets (Karp-Rabin over its chars, mod 1e9+7 so
   * the arithmetic never overflows and ports to any engine), and the
   * bucket's weight is a fixed multiplicative-hash pseudo-weight in
   * [-1000, 1000] milli-units. The document logit is the integer SUM of
   * its tokens' weights; `decision` is the filter verdict (logit ≥ 0).
   * Swapping real trained weights in changes one lookup, none of the
   * dataflow.
   *
   * Scale shape: ONE corpus scan, the score computed per document in a
   * single tight-JVM pass over the text (UDF by measured rule #2 — the
   * per-char HOF lambda would evaluate interpreted); no shuffle at all
   * until the caller aggregates. The oracle recomputes the identical
   * integer arithmetic in SQL.
   */
  def qualityModel(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 4096): DataFrame = {
    val score = udf { (text: String) =>
      if (text == null) (0L, 0L)
      else {
        var nTok = 0L; var logit = 0L
        var i = 0; val n = text.length
        while (i < n) {
          // skip separators
          while (i < n && !isTokChar(text.charAt(i))) i += 1
          if (i < n) {
            var h = 0L
            while (i < n && isTokChar(text.charAt(i))) {
              // lower-case fold matches lower() ++ the ASCII tokenizer
              val c = text.charAt(i)
              val lc = if (c >= 'A' && c <= 'Z') c + 32 else c.toInt
              h = (h * 31L + lc) % 1000000007L
              i += 1
            }
            nTok += 1
            val bucket = h % dim
            logit += ((bucket * 2654435761L) % 2001L) - 1000L
          }
        }
        (nTok, logit)
      }
    }
    df.select(col(idCol), score(col(textCol)).as("_s"))
      .select(col(idCol),
        col("_s._1").as("n_tokens"),
        col("_s._2").as("logit_milli"),
        when(col("_s._2") >= 0L, "keep").otherwise("drop").as("decision"))
      .where(col("n_tokens") > 0)
  }

  private def isTokChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /**
   * Temperature-adjusted mixture weights over corpus sources — the
   * dataset-mixture design step (sampling proportional to p^τ with
   * τ = 1/2 flattens head domains and boosts the tail). Everything is
   * integer-deterministic across engines: shares in milli by integer
   * division, and the τ=0.5 reweight via floor(sqrt(integer)) — IEEE
   * sqrt is correctly rounded, so for inputs < 2^53 both engines
   * compute the identical bit pattern and the floor agrees exactly
   * (a pow(p, 0.7)-style reweight would NOT port: pow is not correctly
   * rounded). One corpus scan into a per-source aggregate; the
   * normalization runs over the handful of source rows.
   */
  def mixtureWeights(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val total = per.agg(sum(col("n_tokens"))).head().getLong(0)
    val w = per
      .withColumn("share_milli", expr(s"(n_tokens * 1000) DIV ${total}L"))
      .withColumn("temp_w",
        floor(sqrt(expr(s"(n_tokens * 1000000) DIV ${total}L"))).cast("long"))
    val wTotal = w.agg(sum(col("temp_w"))).head().getLong(0)
    w.withColumn("mix_milli", expr(s"(temp_w * 1000) DIV ${wTotal}L"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_milli"), col("mix_milli"))
  }

  /**
   * Distributed BPE merge learning — the tokenizer-TRAINING step that
   * [[vocabulary]] only prefaces (reference scope: the training-data
   * pipeline's tokenizer prep). Classic byte-pair encoding over the
   * corpus word distribution: represent each distinct word as
   * space-delimited symbols, then `steps` times (1) count adjacent
   * symbol pairs weighted by corpus word frequency, (2) pick the most
   * frequent pair (deterministic tie-break: count desc, then left/right
   * symbol asc), (3) fuse that pair everywhere. Returns the learned
   * merge table `(merge_rank, sym_left, sym_right, merged, pair_cnt)` —
   * `pair_cnt` is the pair's corpus frequency at selection time, as in
   * standard BPE.
   *
   * Cross-engine contract: the fuse step is a fixed THREE applications
   * of non-overlapping left-to-right `replace(' l r ' → ' lr ')` on the
   * delimited string. One application can miss chained occurrences
   * (`" l r l r "` — the shared delimiter is consumed by the first
   * match); three applications reach the fixpoint for any chain depth
   * that survives two rounds, and the count is fixed (not
   * iterate-until-stable) so Spark and the SQL oracle compute the
   * IDENTICAL result by construction. A replacement token can never
   * spell a new `" l r "` match (it is a single delimited symbol), so
   * the pass count only ever under-merges — identically on both sides.
   *
   * Scale shape: the only corpus-shaped stage is the one word-count
   * shuffle building the distinct-word frame (exactly [[vocabulary]]'s
   * heavy stage). Each of the `steps` iterations then runs over
   * DISTINCT words only — pair extraction is a zero-shuffle zip/explode,
   * the pair count aggregates with map-side partials (shuffle bounded
   * by observed distinct pairs, ≤ symbol-vocab²), and only ONE row
   * reaches the driver per step. The word frame re-persists each
   * iteration so lineage stays flat. At 100 TB: ~1e8 distinct words ×
   * a few dozen iterations of small aggs — the corpus itself is
   * touched once.
   */
  def bpeTrain(df: DataFrame, textCol: String, steps: Int): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val spark = df.sparkSession
    // distinct lowercase-alphabetic words with corpus counts, as
    // delimited symbol strings " h e l l o "
    val words0 = df
      .select(explode(tokens(lower(col(textCol)))).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
        .as("seq"), col("cnt"))

    var cur = words0.persist()
    cur.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val syms = cur.select(split(trim(col("seq")), " ").as("s"), col("cnt"))
      val best = syms
        .select(explode(arrays_zip(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1))).as("p"), col("cnt"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, l, r, l + r, c))
        // symbols are [a-z]+ by the word filter — safe as SQL literals
        val pat = s" $l $r "; val rep = s" $l$r "
        val fused = cur.withColumn("seq",
          expr(s"replace(replace(replace(seq, '$pat', '$rep'), '$pat', '$rep'), '$pat', '$rep')"))
        val next = fused.persist()
        next.count()
        cur.unpersist()
        cur = next
        step += 1
      }
    }
    cur.unpersist()
    import spark.implicits._
    merges.toSeq
      .toDF("merge_rank", "sym_left", "sym_right", "merged", "pair_cnt")
  }

  /**
   * BPE ENCODE with a learned merge table — the apply half of
   * [[bpeTrain]]: each document's alphabetic words become delimited
   * char sequences, the `merges` apply in rank order (each as the same
   * fixed 3-pass delimited replace the trainer used, so train and
   * encode share one fusion contract), and the output is the document's
   * token count under the trained tokenizer — the number every
   * packing/budgeting stage downstream consumes. Non-word tokens
   * (digits etc.) count as single symbols.
   *
   * Scale shape: pure per-row string work — ONE corpus scan, zero
   * shuffle, every replace codegen'd (`replace` is a native Catalyst
   * StringReplace); the merge table is k literals baked into the plan,
   * exactly how a broadcast tokenizer ships at 100 TB.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (l, r) =>
      require((l + r).matches("[a-z]+"), s"non-alphabetic merge: $l+$r") }
    // delimit every alphanumeric char as its own symbol; non-alnum
    // runs become a " / " boundary marker so merges can never span
    // words. (No lookahead anywhere — the oracle's RE2 lacks it, so
    // the contract sticks to plain global replaces.)
    val spaced = concat(lit(" "),
      regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " / "),
        "([a-z0-9])", "$1 "),
      lit(" "))
    val fused = merges.foldLeft(spaced) { case (c, (l, r)) =>
      val pat = s" $l $r "; val rep = s" $l$r "
      (1 to 3).foldLeft(c)((cc, _) =>
        call_function("replace", cc, lit(pat), lit(rep)))
    }
    df.select(col(idCol),
      size(filter(split(trim(fused), " +"),
          t => t =!= lit("") && t =!= lit("/")))
        .cast("long").as("n_bpe_symbols"))
  }

  def bm25(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], topN: Int = 20): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    // ONE hashed pass computes every term frequency (codegen'd
    // TermCounts) — the previous per-term `size(filter(...))` lambdas
    // walked the token array k times, interpreted
    val base = docs.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("_dl"),
        org.apache.spark.sql.graft.TermCounts.asColumn(col("_toks"), terms)
          .as("_tfs"))
    def tf(i: Int): Column = element_at(col("_tfs"), i + 1)
    val aggs = count(lit(1)).as("n") +: sum(col("_dl")).as("sumdl") +:
      terms.indices.map(i =>
        sum(when(tf(i) > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val st = base.agg(aggs.head, aggs.tail: _*).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n.toDouble
    val termScores = terms.indices.map { i =>
      val dfT = st.getLong(2 + i)
      val idf = (n.toDouble - dfT.toDouble + 0.5) / (dfT.toDouble + 0.5)
      val tfd = tf(i).cast("double")
      lit(idf) * (tfd * lit(2.2)) /
        (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * col("_dl").cast("double") / lit(avgdl)))
    }
    base.select(col(idCol),
        round(termScores.reduce(_ + _) * lit(1000000.0)).cast("long")
          .as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(topN)
  }
}
