package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact.zround
import graft.functions.PixieFunctions.idiv

/** Text-analysis operators for training-data pipelines (SURVEY §7.9):
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. Pure codegen'd expressions — no UDFs — so they stream
  * through WholeStageCodegen at any scale.
  */
object TextOps {

  /** Marker-word tables for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "que", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  private def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isin(markers: _*)))

  /** Language-ID: marker-word votes with a deterministic priority
    * tie-break (en > de > es > fr); 'unknown' when no markers hit.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val scored = langMarkers.foldLeft(df) { case (d, (lang, ms)) =>
      d.withColumn(s"score_$lang", markerCount(w, ms).cast("long"))
    }
    val total = langMarkers.map { case (l, _) => col(s"score_$l") }.reduce(_ + _)
    val best = langMarkers.map { case (l, _) => (l, col(s"score_$l")) }
    val pred = when(total === 0, lit("unknown")).otherwise(
      best.foldRight(lit("unknown")) { case ((lang, s), els) =>
        when(best.filter(_._1 != lang).map(o => s >= o._2).reduce(_ && _), lit(lang))
          .otherwise(els)
      })
    scored.withColumn("lang_pred", pred)
  }

  /** Quality features + composite score (length, lexical diversity,
    * stopword load) — the shape of the reference-free quality filters
    * used in large corpus cleaning.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    df.withColumn("n_words", size(w).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(w)).cast("long"))
      .withColumn("avg_word_len",
        (length(col(textCol)) - size(w) + 1).cast("double") / size(w))
      .withColumn("stop_ratio",
        markerCount(w, stop).cast("double") / size(w))
      .withColumn("distinct_ratio",
        size(array_distinct(w)).cast("double") / size(w))
      .withColumn("quality_score",
        least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.4
          + col("distinct_ratio") * 0.3
          + (lit(1.0) - col("stop_ratio")) * 0.3)
  }

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation).
    */
  val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col(textCol), lit(tokenPattern), lit(0))).cast("long"))

  // ---- BPE tokenizer (train + encode) -------------------------------
  //
  // Byte-pair encoding for training-data pipelines. Scale contract:
  //  * ENCODE is a pure codegen'd Column — the trained merge table is
  //    folded into a chain of `replace` calls over a marker symbol
  //    string, so tokenization streams through WholeStageCodegen with no
  //    UDF and no per-row allocation beyond the string builder. Each
  //    symbol is wrapped '|sym|' (chars: '|a||b|'); sequential
  //    left-to-right non-overlapping `replace` of '|a||b|'->'|ab|' IS
  //    the BPE merge application in rank order. Both-side wrapping makes
  //    a symbol-boundary false match impossible — the pattern anchors
  //    the END of the first symbol and the END of the second, so neither
  //    a tail of 'aa' nor a prefix of 'ab' can stand in for 'a' — and
  //    unlike a shared single separator, adjacent matches don't consume
  //    each other's anchor ('|a||b||a||b|' replaces twice in one scan).
  //  * TRAIN follows the standard tokenizer-trainer shape: ONE corpus-
  //    scale pass (distributed word-frequency aggregation, shuffle keyed
  //    by word), then greedy merge learning over the BOUNDED word table
  //    (capped at maxVocab by frequency with a deterministic tie-break).
  //    At 100 TB the corpus pass is the only data-volume stage; the
  //    merge loop is O(maxVocab · merges) driver work, same as the
  //    word-count-then-train design used by production BPE trainers.

  /** A fixed, sf-independent merge table for the gate (multi-level:
    * 'table' collapses to a single token through four ranks; 'er'/'in'/
    * 'ine' exercise merge-on-merged interactions). Any list is a valid
    * encode input — the gate pins that Spark and the SQL oracle apply
    * the SAME sequential-replace semantics.
    */
  val fixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
    "e" -> "r", "a" -> "n", "o" -> "w", "i" -> "n", "in" -> "e",
    "s" -> "t", "c" -> "o", "q" -> "u")

  /** One corpus pass: distinct words with frequencies, capped at
    * `maxVocab` (by count desc, then word asc — deterministic).
    */
  def bpeWordCounts(df: DataFrame, textCol: String, maxVocab: Int = 100000): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocab)

  /** Learn `nMerges` BPE merges from the corpus. Deterministic: the best
    * pair is max count, ties broken by the lexicographically smallest
    * (a, b). Returns merges in rank order, ready for [[bpeEncodeWord]].
    *
    * INCREMENTAL pair maintenance (the Sennrich reference-trainer
    * structure, closing the r11-verdict driver-cost item): pair counts
    * are built ONCE from the capped word table, and each merge then
    * touches only the words that actually CONTAIN the merged pair (an
    * inverted pair→words index with lazy staleness checks) — per-merge
    * driver work is proportional to the pair's support, flat in the
    * vocabulary size, instead of the previous full recount over every
    * word per merge. Counts are exact longs maintained by subtract-
    * then-re-add per touched word, so the selected merges (including
    * every tie-break) are IDENTICAL to a full recount — Round12Spec
    * pins equality against a naive recount on the fixture.
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               maxVocab: Int = 100000, wordPrefix: String = ""): Seq[(String, String)] = {
    val rows = bpeWordCounts(df, textCol, maxVocab).collect()
    val words: Array[Vector[String]] = rows.map(r =>
      (wordPrefix + r.getString(0)).map(_.toString).toVector)
    val counts: Array[Long] = rows.map(_.getLong(1))
    val pairCounts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def scanPairs(syms: Vector[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        f((syms(i), syms(i + 1))); i += 1
      }
    }
    var w = 0
    while (w < words.length) {
      val c = counts(w)
      scanPairs(words(w)) { p =>
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        occurs.getOrElseUpdate(p,
          scala.collection.mutable.HashSet.empty[Int]) += w
      }
      w += 1
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      // zero-count residue (pairs merged away) is filtered, so the
      // argmin domain equals a from-scratch recount's
      val bestOpt = pairCounts.view.filter(_._2 > 0L)
        .minByOption { case ((x, y), c) => (-c, x, y) }
      if (bestOpt.isEmpty) done = true
      else {
        val (a, b) = bestOpt.get._1
        merges += ((a, b))
        val touched = occurs.getOrElse((a, b),
          scala.collection.mutable.HashSet.empty[Int])
        touched.foreach { i =>
          val syms = words(i)
          // lazy staleness: the index is never pruned on subtract, so
          // verify the pair is still present before rewriting
          var has = false
          var j = 0
          while (!has && j < syms.length - 1) {
            has = syms(j) == a && syms(j + 1) == b; j += 1
          }
          if (has) {
            val c = counts(i)
            scanPairs(syms) { p => pairCounts(p) = pairCounts(p) - c }
            val merged = mergePair(syms, a, b)
            words(i) = merged
            scanPairs(merged) { p =>
              pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
              occurs.getOrElseUpdate(p,
                scala.collection.mutable.HashSet.empty[Int]) += i
            }
          }
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Greedy left-to-right, non-overlapping merge of adjacent (a, b) —
    * the same contract as the `replace` chain in [[bpeEncodeWord]].
    */
  def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word into its marker symbol string: every char wrapped
    * '|c|', then each merge applied as a sequential replace.
    */
  def bpeEncodeWord(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(w, "(.)", "|$1|")) { case (s, (a, b)) =>
      replace(s, lit("|" + a + "||" + b + "|"), lit("|" + a + b + "|"))
    }

  /** Token array for a whitespace-separated text column. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(split(text, " "), w =>
      filter(split(bpeEncodeWord(w, merges), "\\|"), t => t =!= "")))

  /** The matching DuckDB expression for [[bpeEncodeWord]] over a column
    * expression `w` — used by the gate oracles (dev-side SQL only).
    */
  def bpeEncodeSql(w: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(s"regexp_replace($w,'(.)','|\\1|','g')") { case (s, (a, b)) =>
      s"replace($s,'|$a||$b|','|$a$b|')"
    }

  /** Tokenizer fertility report: per group (source/language), word,
    * token and char mass plus tokens-per-word (fertility) and
    * chars-per-token — the standard "evaluate a tokenizer against a
    * corpus" rollup that sizes context budgets and flags under-served
    * slices (fertility >> 1 means the tokenizer fragments that slice).
    * One map pass (the BPE replace chain is codegen'd string work) +
    * one keyed aggregate; ratios divide the group sums, so the result
    * is exact at any partitioning.
    */
  def tokenizerFertility(df: DataFrame, textCol: String, groupCol: String,
                         merges: Seq[(String, String)]): DataFrame =
    df.select(col(groupCol),
        size(filter(split(col(textCol), " "), w => w =!= ""))
          .cast("long").as("__nw"),
        size(bpeTokens(col(textCol), merges)).cast("long").as("__nt"),
        length(col(textCol)).cast("long").as("__nc"))
      .groupBy(col(groupCol)).agg(
        sum(col("__nw")).as("n_words"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))

  /** Per-document n-gram novelty: the share of a doc's DISTINCT n-grams
    * that appear in no other document — the diversity signal dual to
    * duplicate-span coverage (novel docs are selection candidates,
    * all-boilerplate docs score 0). One explode + one gram-keyed
    * doc-frequency aggregate + a join-back keyed by gram, then a
    * doc-keyed rollup: nothing pairwise, the contamination-check shape
    * turned inward on the corpus itself.
    */
  def gramNovelty(df: DataFrame, textCol: String, idCol: String,
                  n: Int = 3): DataFrame = {
    // the gram stream feeds the DF aggregate AND the join-back; the two
    // subtrees differ in projection so Catalyst cannot reuse the
    // exchange — materialize the postings list once (measured: the
    // explode re-ran per consumer; the weightedJaccard pattern)
    val g = df.select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("g"))
      .localCheckpoint(false)
    val dfreq = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
    g.join(dfreq, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams"), 6))
  }

  /** Per-document unigram entropy in nats — the quality signal that
    * separates natural prose from keyword-stuffed / generated spam
    * (low entropy = few tokens dominate) independently of the
    * repetition ratios. Uses H = ln n − (Σ c·ln c)/n with the per-word
    * c·ln c terms quantized to integer micro-nats BEFORE the per-doc
    * sum (the engine-exactness contract: the sum is order-independent
    * at any partitioning). One explode + two keyed aggregates.
    */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val wcnt = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    wcnt.groupBy(col(idCol)).agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * 1e6 + 0.5).cast("long")).as("__q"))
      .withColumn("entropy_nats", round(
        log(col("n_words").cast("double"))
          - col("__q").cast("double") / 1e6 / col("n_words"), 6))
      .drop("__q")
  }

  /** Intra-document repetition signals (Rae et al., Gopher, 2021 —
    * the "repetition removal" filter family): per doc, over word
    * `n`-grams, the duplicate-gram fraction (1 − distinct/total) and
    * the share of the single most-frequent gram. MAP-ONLY — the gram
    * array is sorted per row and duplicates/max-run counted by one
    * higher-order `aggregate` fold over adjacent equals, so the
    * corpus never shuffles for an intra-doc signal (the shape that
    * matters at 100 TB: this runs in the same scan as every other
    * per-doc filter). Fractions are exact integer ratios rounded once.
    *
    * Relation to [[graft.ops.Corpus.repetitionStats]] (the original
    * Gopher battery, q55-era): that op computes dup5/dup10 ratios and
    * the top-2-gram CHARACTER share via explode + (doc, gram)-keyed
    * aggregation — a shuffle per signal. This op produces the same
    * dup-gram fraction (equivalence pinned in Round8Spec) with ZERO
    * shuffle, plus the top-gram OCCURRENCE share; prefer it when the
    * signal feeds a same-scan filter chain, and repetitionStats when
    * the gram text itself (top2_gram) must be reported.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2): DataFrame = {
    val sorted = array_sort(Dedup.shingles(col(textCol), n))
    // fold: (prev gram, current run, max run, duplicate count).
    // prev starts NULL and equality is null-safe (<=>): an empty-string
    // gram (empty doc, doubled spaces at n=1) must NOT match the
    // sentinel — a "" sentinel would count the first such gram as a
    // duplicate and report dup_gram_frac=1.0 where the oracle says 0.
    val acc0 = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("maxrun"), lit(0L).as("dups"))
    val folded = aggregate(sorted, acc0, (acc, g) => {
      val isDup = g <=> acc.getField("prev")
      val run = when(isDup, acc.getField("run") + 1L).otherwise(lit(1L))
      struct(g.as("prev"), run.as("run"),
        greatest(run, acc.getField("maxrun")).as("maxrun"),
        (acc.getField("dups") + when(isDup, 1L).otherwise(0L)).as("dups"))
    })
    df.select(col(idCol), folded.as("__f"),
        size(Dedup.shingles(col(textCol), n)).cast("long").as("total_grams"))
      .select(col(idCol), col("total_grams"),
        (col("total_grams") - col("__f").getField("dups"))
          .as("distinct_grams"),
        round(col("__f").getField("dups").cast("double") /
          greatest(col("total_grams"), lit(1L)), 6).as("dup_gram_frac"),
        round(col("__f").getField("maxrun").cast("double") /
          greatest(col("total_grams"), lit(1L)), 6).as("top_gram_frac"))
  }

  /** Inter-document segment-level exact dedup (the RefinedWeb /
    * "paragraph dedup" stage, adapted to unstructured text): each doc
    * splits into consecutive `w`-word segments, segments are hashed,
    * and a segment text seen in MORE THAN ONE doc marks every holder.
    * Reports each doc's duplicated-segment fraction — the signal that
    * catches boilerplate blocks (headers, footers, license text)
    * embedded in otherwise-unique pages, which whole-doc dedup misses.
    * Shape: one map-side segment explode, one hash-keyed distinct-doc
    * count per segment, one join back keyed by segment hash, one
    * per-doc agg — all shuffles on high-cardinality keys.
    */
  def segmentDupFraction(df: DataFrame, textCol: String, idCol: String,
                         w: Int = 20): DataFrame = {
    val words = filter(split(col(textCol), " "), x => x =!= "")
    // map-only segment slicing (deterministic word order by construction
    // — no collect_list whose post-shuffle order could drift)
    val segTexts = transform(
      sequence(lit(0), floor((size(words) - 1) / w).cast("int")),
      i => concat_ws(" ", slice(words, i * w + 1, lit(w))))
    val segs = df.where(size(words) > 0)
      .select(col(idCol).as("doc_id"), explode(segTexts).as("seg_text"))
      .select(col("doc_id"), md5(col("seg_text").cast("binary")).as("seg_hash"))
    val shared = segs.groupBy("seg_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    segs.join(shared, "seg_hash")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_segments"))
      .withColumn("dup_segment_frac", round(
        col("n_dup_segments").cast("double") / col("n_segments"), 6))
  }

  /** Unigram-LM surprisal score (the perplexity-proxy quality filter,
    * the shape of CCNet/DSIR importance scoring with the corpus's own
    * unigram model): p(w) = count(w)/N over the whole slice; each doc
    * scores mean −ln p(w) in MICRO-NATS, quantized per word BEFORE the
    * cross-row sum (long sums are order-exact at any partitioning —
    * the engine-exactness contract). Low surprisal = templated/common
    * text; high = rare-token noise. Two keyed shuffles (word counts,
    * then doc rollup); the 1-row corpus total is a broadcast join.
    */
  def unigramSurprisal(df: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val words = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    val counts = words.groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("nn"))
    words.join(counts, "w").crossJoin(broadcast(total))
      .select(col(idCol),
        floor(-log(col("c").cast("double") / col("nn")) * 1e6 + 0.5)
          .cast("long").as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("q")).as("__s"))
      .select(col(idCol), col("n_words"),
        round(col("__s").cast("double") / 1e6 / col("n_words"), 6)
          .as("mean_surprisal_nats"))
  }

  /** Pagination-stitch detection: doc pairs where A's LAST `w` words
    * equal B's FIRST `w` words — the boundary artifact of a crawler
    * splitting one page into consecutive records (near-dup checks miss
    * it: the docs as wholes are different). One map pass extracts each
    * doc's head/tail phrase; the equi-join on the phrase hash finds
    * stitch candidates, and carrying the phrase itself makes the match
    * exact (no hash-collision false positives). Self-stitches (a doc
    * whose head == its own tail) are excluded.
    */
  def stitchPairs(df: DataFrame, textCol: String, idCol: String,
                  w: Int = 8): DataFrame = {
    val words = split(col(textCol), " ")
    val base = df.select(col(idCol), words.as("__w"),
        size(words).as("__n"))
      .where(col("__n") >= w)
    val tails = base.select(col(idCol).as("doc_a"),
      concat_ws(" ", slice(col("__w"), col("__n") - w + 1, lit(w)))
        .as("phrase"))
    val heads = base.select(col(idCol).as("doc_b"),
      concat_ws(" ", slice(col("__w"), 1, w)).as("phrase"))
    tails.join(heads, "phrase")
      .where(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("phrase"))
  }

  /** Per-source template report: each source's modal opening phrase
    * (first `w` words) and its share of the source's docs — the
    * header/boilerplate detector a crawl pipeline runs per site before
    * choosing [[graft.ops.Corpus.removeRepeatedSegments]] targets.
    * Ties break to the lexicographically greatest phrase (max(struct),
    * the q241 top-gram contract). Two keyed aggregates, output is
    * O(#sources).
    */
  def sourceTemplates(df: DataFrame, textCol: String, groupCol: String,
                      w: Int = 8): DataFrame = {
    val head = concat_ws(" ", slice(split(col(textCol), " "), 1, w))
    val counts = df.select(col(groupCol), head.as("phrase"))
      .groupBy(col(groupCol), col("phrase")).agg(count(lit(1)).as("c"))
    val tot = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    counts.groupBy(col(groupCol))
      .agg(max(struct(col("c"), col("phrase"))).as("t"))
      .join(tot, groupCol)
      .select(col(groupCol), col("n_docs"),
        col("t.phrase").as("template_phrase"),
        col("t.c").as("n_template"),
        round(col("t.c").cast("double") / col("n_docs"), 6)
          .as("template_share"))
  }

  /** Blocklist filter (the C4 "bad words" rule: drop any page containing
    * a blocked term): per doc, the distinct blocked words present and
    * the keep verdict. The blocklist travels as a LITERAL array
    * (broadcast by construction, the model-not-data pattern) and the
    * match is one codegen'd array_intersect over the token set —
    * map-only, zero shuffle, no regex scan per term.
    */
  def blocklistFilter(df: DataFrame, textCol: String, idCol: String,
                      blocked: Seq[String]): DataFrame =
    df.select(col(idCol),
        array_intersect(array_distinct(split(col(textCol), " ")),
          typedLit(blocked)).as("matched"))
      .select(col(idCol),
        concat_ws(",", array_sort(col("matched"))).as("matched_words"),
        size(col("matched")).cast("long").as("n_matched"),
        (size(col("matched")) === 0).as("keep"))

  /** Unicode script / char-class profile per document — the signal a
    * multilingual curation pipeline routes on (wrong-script content in
    * a monolingual corpus, digit-heavy table dumps, mixed-script spam).
    * Counts are code-point exact via strip-and-diff (`length(text) −
    * length(text without the class)`) over explicit code-point ranges,
    * so every engine agrees without depending on regex script-table
    * versions. Pure map — zero shuffle.
    */
  val scriptClasses: Seq[(String, String, String)] = Seq(
    // (name, Java regex char class, RE2/DuckDB char class)
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", "[\u0400-\u04ff]", "[\\x{0400}-\\x{04ff}]"),
    ("han", "[\u4e00-\u9fff]", "[\\x{4e00}-\\x{9fff}]"),
    ("digit", "[0-9]", "[0-9]"))

  def scriptProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tot = length(col(textCol)).cast("long")
    val counted = scriptClasses.foldLeft(
      df.select(col(idCol), col(textCol), tot.as("n_chars"))) {
      case (d, (nm, re, _)) =>
        d.withColumn(s"n_$nm",
          (col("n_chars") - length(regexp_replace(col(textCol), re, ""))
            ).cast("long"))
    }
    val shares = scriptClasses.map { case (nm, _, _) =>
      round(col(s"n_$nm").cast("double") /
        greatest(col("n_chars"), lit(1L)), 6).as(s"${nm}_share") }
    counted.select(
      col(idCol) +: col("n_chars") +:
        (scriptClasses.map(c => col(s"n_${c._1}")) ++ shares): _*)
  }

  /** Okapi BM25 keyword retrieval — the lexical baseline of every
    * retrieval stack (and the query-based corpus-mining tool next to
    * the embedding ANN family): score(d,q) = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·len/avglen)), idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Scale shape: one corpus pass builds the (word, doc, tf) postings
    * (keyed shuffle with map-side combine) and the O(vocab) df table;
    * query terms join the postings keyed by word (the inverted-index
    * probe — only matching postings flow), then one per-(query, doc)
    * sum and a per-query top-k rank over candidates. The corpus never
    * joins pairwise and avglen/N travel as a broadcast 1-row frame.
    * Every factor is a fixed double formula over exact integer
    * (tf, df, len, N) inputs — engines rank identically; ties break to
    * the lower doc id.
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, queryCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = corpus.select(col(idCol).as("did"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    val tf = words.groupBy("did", "w").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val lens = words.groupBy("did").agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).as("nd"), sum(col("len")).as("tl"))
    val qt = queries.select(col(idCol).as("query_id"),
        explode(array_distinct(split(col(queryCol), " "))).as("w"))
      .where(col("w") =!= "")
    val scored = qt.join(tf, "w").join(df_, "w")
      .join(lens, "did").crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("nd") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("norm", lit(k1) * (lit(1.0 - b) +
        lit(b) * col("len") / (col("tl").cast("double") / col("nd"))))
      .withColumn("term_q", floor(col("idf") *
        (col("tf") * (k1 + 1.0)) / (col("tf") + col("norm"))
        * 1e9 + 0.5).cast("long"))
      .groupBy("query_id", "did")
      .agg(sum(col("term_q")).as("score_q"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("did").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("did").as("doc_id"), col("rank"),
        col("n_terms"),
        round(col("score_q").cast("double") / 1e9, 6).as("bm25"))
  }

  /** Snippet extraction for [[bm25TopK]] hits: per (query, top-k doc),
    * the `w`-word window holding the most query-term occurrences (tie →
    * earliest start) plus the snippet text — the search-result preview
    * stage. Shape: the hit list joins only the query terms' positions
    * (inverted probe, like [[phraseSearch]]); candidate windows are the
    * hit positions themselves, so the per-doc self-join is bounded by
    * term-hit count², never doc length². The snippet text comes from
    * one keyed join back to the hit docs.
    */
  def bm25Snippets(corpus: DataFrame, queries: DataFrame, idCol: String,
                   textCol: String, queryCol: String, k: Int,
                   w: Int = 8): DataFrame = {
    val hits = bm25TopK(corpus, queries, idCol, textCol, queryCol, k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val post = corpus.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tw")))
    val qts = queries.select(col(idCol).as("query_id"),
        explode(array_distinct(split(col(queryCol), " "))).as("tw"))
      .where(col("tw") =!= "")
    val hitPos = hits.join(qts, "query_id")
      .join(post, Seq("doc_id", "tw"))
      .select(col("query_id"), col("doc_id"), col("rank"), col("pos"))
    val wins = hitPos.toDF("query_id", "doc_id", "rank", "p")
      .join(hitPos.select(col("query_id"), col("doc_id"), col("pos").as("q2")),
        Seq("query_id", "doc_id"))
      .where(col("q2") >= col("p") && col("q2") < col("p") + w)
      .groupBy("query_id", "doc_id", "rank", "p")
      .agg(count(lit(1)).as("hw"))
    val best = wins.groupBy("query_id", "doc_id", "rank")
      .agg(max(struct(col("hw").as("h"), (-col("p")).as("negp"))).as("b"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("b.h").as("hits_in_window"),
        (-col("b.negp")).cast("long").as("best_start"))
    best.join(corpus.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("hits_in_window"), col("best_start"),
        concat_ws(" ", slice(split(col(textCol), " "),
          col("best_start").cast("int") + 1, lit(w))).as("snippet"))
  }

  /** Exact phrase search over a POSITIONAL inverted index — the
    * index-probe alternative to scanning every document with a regex:
    * postings (doc, position, word) join the query's (offset, word)
    * terms keyed by word, so only postings of the query's words flow;
    * a phrase occurrence is a start position where EVERY offset matches
    * (count(distinct offset) == phrase length after grouping by
    * (query, doc, pos − offset) — the classic positional-AND).
    * Output: one row per (query, matching doc) with occurrence count
    * and first position. Phrases with repeated words work: each offset
    * must be witnessed independently.
    */
  def phraseSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                   textCol: String, phraseCol: String): DataFrame = {
    val post = corpus.select(col(idCol).as("did"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val qts = queries.select(col(idCol).as("query_id"),
        size(split(col(phraseCol), " ")).as("plen"),
        posexplode(split(col(phraseCol), " ")).as(Seq("off", "w")))
    val starts = qts.join(post, "w")
      .select(col("query_id"), col("plen"), col("did"),
        (col("pos") - col("off")).as("start"), col("off"))
      .groupBy("query_id", "plen", "did", "start")
      .agg(countDistinct(col("off")).as("hit"))
      .where(col("hit") === col("plen") && col("start") >= 0)
    starts.groupBy("query_id", "did")
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
      .select(col("query_id"), col("did").as("doc_id"),
        col("n_matches"), col("first_pos"))
  }

  /** The canonical text-normalization column: Unicode NFC (composed
    * accent forms — see [[graft.expressions.NfcNormalize]]) → ASCII
    * control chars to spaces → whitespace runs collapsed → trimmed.
    * Crawled corpora mix composed/decomposed forms and embed tabs/CRs;
    * every downstream hash (exact dedup, MinHash, winnowing) silently
    * splits identical documents unless this runs first. Pure map —
    * zero shuffle at any corpus size.
    */
  def normalizeCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.expressions.NfcNormalize.column(text),
        "[\\x00-\\x1f\\x7f]", " "),
      " +", " "))

  /** Per-doc normalization report: the normalized text plus the
    * before/after char counts (the "how dirty is this source" signal).
    */
  def normalizeText(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), col(textCol),
        normalizeCol(col(textCol)).as("norm_text"),
        length(col(textCol)).cast("long").as("n_chars_raw"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
      .withColumn("changed", col("norm_text") =!= col(textCol))
      .drop(textCol)

  /** Distinct-n diversity report (the generation-diversity staple, run
    * per corpus slice): for each n in `ns`, the slice's total and
    * distinct word-n-gram counts and their ratio — low distinct-n means
    * templated/repetitive text dominates the slice. One explode + one
    * two-level agg per n, each keyed by (slice, gram) — partial
    * aggregation combines map-side, nothing is pairwise.
    */
  def distinctNgramRatio(df: DataFrame, textCol: String, groupCol: String,
                         ns: Seq[Int] = Seq(1, 2, 3)): DataFrame =
    ns.map { n =>
      df.select(col(groupCol), explode(Dedup.shingles(col(textCol), n)).as("g"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("total_grams"),
          countDistinct(col("g")).as("distinct_grams"))
        .select(col(groupCol), lit(n).as("n"), col("total_grams"),
          col("distinct_grams"),
          round(col("distinct_grams").cast("double") / col("total_grams"), 6)
            .as("distinct_ratio"))
    }.reduce(_ unionByName _)

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS document-fingerprinting scheme): hash every word n-gram,
    * slide a window of `w` consecutive gram hashes, select each
    * window's MINIMUM — guaranteeing any shared run of >= w+n-1 words
    * shares at least one selected fingerprint (the positional coverage
    * property set-based MinHash lacks). Emitted as distinct (doc, fp)
    * rows. Map-only: one array fold per doc, zero shuffle; docs shorter
    * than one window contribute their global minimum.
    */
  def winnowing(df: DataFrame, textCol: String, idCol: String,
                n: Int = 3, w: Int = 4): DataFrame = {
    val hs = transform(Dedup.shingles(col(textCol), n),
      g => pmod(Dedup.h60(g), lit(Dedup.P)))
    // Guard on the CHEAP equivalent predicate, not on size(__hs):
    // shingles of a non-null text always yield >= 1 gram hash
    // (sequence(0, greatest(w-n, 0)) is never empty), so `__n > 0`
    // only ever excluded null texts — but written over __hs it was
    // alias-substituted and pushed below the scan-spread exchange
    // (PushPredicateThroughNonJoin), re-running the whole shingling
    // chain serially on the narrow scan. IsNotNull pushes down to the
    // parquet scan for free and the HOF fold runs once, post-spread.
    df.where(col(textCol).isNotNull)
      .select(col(idCol), hs.as("__hs"))
      .withColumn("__n", size(col("__hs")))
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(0), greatest(col("__n") - w, lit(0))),
          i => array_min(slice(col("__hs"), i + 1, lit(w)))))).as("fp"))
  }

  /** Fingerprint-match candidate pairs over [[winnowing]] output — the
    * MOSS overlap report: docs sharing >= `minShared` fingerprints,
    * with the containment ratio shared/min(|A|,|B|). Fingerprints
    * appearing in more than `maxDocFreq` docs are dropped FIRST (they
    * are boilerplate, and they are also the join's fan-out hazard — the
    * df-filter is the scale contract that keeps the inverted-index
    * self-join linear in true matches). Two keyed shuffles + the
    * fp-keyed join.
    */
  def winnowMatches(fps: DataFrame, minShared: Int = 3,
                    maxDocFreq: Int = 50): DataFrame = {
    // `keep` feeds three consumers (sizes + both sides of the inverted
    // join); without truncation the winnowing HOF fold re-executes per
    // consumer. Lazy localCheckpoint materializes it once (the
    // PxlRunner fork pattern; swap for checkpoint() on a cluster).
    val dfreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val keep = fps.join(dfreq.where(col("__df") <= maxDocFreq), "fp")
      .select(col(fps.columns.head).as("did"), col("fp"))
      .localCheckpoint(false)
    val sizes = keep.groupBy(col("did")).agg(count(lit(1)).as("nfp"))
    keep.toDF("doc_a", "fp")
      .join(keep.toDF("doc_b", "fp"), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_fps"),
        round(col("shared_fps").cast("double") /
          least(col("na"), col("nb")), 6).as("containment"))
  }

  /** Set fingerprint: XOR + bounded-sum of distinct-word hashes —
    * order-independent, exact in any engine, mergeable.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = df.select(col(idCol),
        explode(array_distinct(split(col(textCol), " "))).as("w"))
      .withColumn("h", pmod(Dedup.h60(col("w")), lit(Dedup.P)))
    words.groupBy(col(idCol)).agg(
      expr("bit_xor(h)").as("xor_fp"),
      sum(col("h")).as("sum_fp"),
      count(lit(1)).as("n_distinct_words"))
  }

  /** Phrase (collocation) mining — the word2vec preprocessing pass
    * (Mikolov et al. 2013, "Distributed Representations of Words and
    * Phrases", §4): score(w1,w2) = (count(w1 w2) - delta) * N /
    * (count(w1) * count(w2)), promoting bigrams that co-occur far more
    * than unigram independence predicts ("new york" -> "new_york").
    * The score is exact staged integer division in e6 units —
    * `(c_ab - delta) * 1e6 div c_a`, then `* N div c_b` — so no
    * intermediate exceeds 1e6 * N and every engine computes the
    * identical value at any corpus size.
    *
    * Scale: unigram and bigram counts are word-keyed aggregates; the
    * two count joins are keyed on the bigram's member words (the
    * bigram table is the small side after the minCount cut); N is a
    * broadcast 1-row frame. Nothing is ever keyed by document.
    */
  def phraseMining(df: DataFrame, textCol: String, delta: Long = 2L,
                   minCount: Long = 3L, minScoreE6: Long = 0L): DataFrame = {
    require(delta >= 0 && minCount > delta,
      "phraseMining: minCount must exceed the discount")
    val w = split(col(textCol), " ")
    val toks = df.select(w.as("__w")).where(size(col("__w")) > 0)
    val uni = toks.select(explode(col("__w")).as("w"))
    val nTotal = uni.agg(count(lit(1)).as("__N"))
    val cW = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.where(size(col("__w")) >= 2)
      .select(slice(col("__w"), lit(1), size(col("__w")) - 1).as("l"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("r"))
      .select(explode(arrays_zip(col("l"), col("r"))).as("z"))
      .select(col("z.l").as("w1"), col("z.r").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    bi.join(cW.select(col("w").as("w1"), col("c").as("__c1")), "w1")
      .join(cW.select(col("w").as("w2"), col("c").as("__c2")), "w2")
      .crossJoin(broadcast(nTotal))
      .select(col("w1"), col("w2"), col("c_ab"),
        col("__c1").as("c_w1"), col("__c2").as("c_w2"),
        idiv(idiv((col("c_ab") - delta) * 1000000L, col("__c1"))
          * col("__N"), col("__c2")).as("score_e6"))
      .where(col("score_e6") >= minScoreE6)
  }

  /** Heaps-law vocabulary growth: distinct-word count as the corpus
    * grows in id order, reported at fixed checkpoints — each word is
    * attributed to the FIRST document that introduces it (one
    * word-keyed min aggregate), so the curve needs no per-prefix
    * rescans. The "is my corpus still adding vocabulary or just
    * repeating itself" read next to [[fingerprint]]/distinct-ngrams.
    *
    * Scale: one word-keyed aggregate + windows over the CHECKPOINT
    * grid (corpus-size / checkpointDocs rows — report-bound, never
    * data-bound).
    */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String,
                  checkpointDocs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(checkpointDocs > 0, "vocabGrowth: checkpointDocs > 0")
    val words = df.select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    val firsts = words.groupBy("w").agg(min(col("__id")).as("__fd"))
      .select(idiv(col("__fd"), lit(checkpointDocs)).as("cp"))
      .groupBy("cp").agg(count(lit(1)).as("new_words"))
    val docs = df.select(idiv(col(idCol), lit(checkpointDocs)).as("cp"))
      .groupBy("cp").agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy("cp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(firsts, Seq("cp"), "left")
      .na.fill(0L, Seq("new_words"))
      .select(col("cp"), col("n_docs"), col("new_words"),
        sum(col("n_docs")).over(w).as("n_docs_cum"),
        sum(col("new_words")).over(w).as("vocab_size"))
  }

  /** Zipf rank-frequency fit: least squares of ln(freq) on ln(rank)
    * over the corpus vocabulary — slope near -1 is the healthy-text
    * signature; a flat or broken slope flags template/boilerplate
    * corpora. Both logs are milli-quantized to integers BEFORE the
    * cross-row sums ([[Dedup]] exactness contract), then the
    * slope/intercept/r2 come from [[Fit.olsSelect]]'s exact-sum
    * formulas. `minCount` trims the hapax tail that flattens the fit.
    *
    * Scale: one word-keyed count + one rank window over the VOCAB
    * table (key-table-bound; the same banded-rank swap as
    * [[Corpus.groupPercentile]] applies beyond ~1e8 words).
    */
  def zipfFit(df: DataFrame, textCol: String,
              minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
    val ranked = counts.withColumn("r", row_number().over(
      Window.orderBy(col("c").desc, col("w"))).cast("long"))
    val q = ranked.select(
      floor(log(col("r").cast("double")) * 1000.0 + 0.5).cast("long").as("x"),
      floor(log(col("c").cast("double")) * 1000.0 + 0.5).cast("long").as("y"))
    q.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_words") +: Fit.olsSelect(col("n"), col("sx"),
        col("sy"), col("sxy"), col("sxx"), col("syy")): _*)
  }

  /** TF-IDF keyword extraction: each doc's top-`k` terms by
    * tf·ln(N/df) — the classic document-summarization signal (Sparck
    * Jones IDF) a curation pipeline uses for topic tagging, dataset
    * cards, and facet search, where BM25 ([[bm25TopK]]) answers the
    * inverse question (score docs FOR a query).
    *
    * Exactness: idf is nano-quantized PER WORD (one ln each — the
    * KL/PSI nano-term contract), the score is the exact integer
    * tf·idf_nano, and ties break word-ascending, so the top-k set is
    * engine- and partitioning-exact. N counts docs with at least one
    * token (docs that contribute no rows can't carry keywords).
    *
    * Scale: two word-keyed aggregates (tf, df), one word-keyed join,
    * a broadcast 1-row N, and a doc-partitioned rank window — no
    * global sort, no all-pairs anywhere; output is k rows per doc.
    */
  def tfidfKeywords(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null doc ids are excluded up front on BOTH engine sides: the
    // oracle's count(DISTINCT doc_id) would drop them from N while a
    // groupBy would keep the null group (the null-parity contract)
    val words = df.where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "w").crossJoin(broadcast(n))
      .withColumn("__score", col("tf") *
        floor(log(col("n_docs").cast("double") / col("df")) * 1e9 + 0.5)
          .cast("long"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("__score").desc, col("w"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w").as("word"), col("tf"),
        round(col("__score").cast("double") / 1e9, 6).as("tfidf"))
  }

  /** Flesch reading-ease per doc with a deterministic syllable proxy
    * (vowel-group runs `[aeiouy]+`, min 1 per word) — the readability
    * gate of a text-quality ladder (alongside [[qualityScore]]'s
    * length/punct/stopword ratios). Sentences count terminator runs
    * `[.!?]+` (min 1 so fragment docs stay defined).
    *
    * All three counts are exact integers computed by the same regex
    * semantics on both engines; the Flesch formula
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) is ONE
    * fixed final double expression over them (the engine-exactness
    * contract). Map-only: zero shuffle, output one row per non-empty
    * doc.
    */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lowered = lower(col(textCol))
    val toks = filter(split(lowered, " "), w => w =!= "")
    df.select(col(idCol),
        size(toks).cast("long").as("n_words"),
        greatest(lit(1L), size(regexp_extract_all(col(textCol),
          lit("[.!?]+"), lit(0))).cast("long")).as("n_sentences"),
        (size(regexp_extract_all(lowered, lit("[aeiouy]+"), lit(0)))
          .cast("long")
          + size(filter(toks, w => !w.rlike("[aeiouy]"))).cast("long"))
          .as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("flesch", zround(lit(206.835)
        - lit(1.015) * col("n_words").cast("double") / col("n_sentences")
        - lit(84.6) * col("n_syllables").cast("double") / col("n_words"), 6))
  }

  /** Pointwise-mutual-information collocations: the top-`k` word
    * bigrams by PMI = ln(c_ab·N / (c_a·c_b)) among bigrams seen at
    * least `minCount` times — the classic phrase/multi-word-expression
    * miner (Church & Hanks 1990). The log's argument is one double
    * expression over exact integer counts and the ln is quantized to
    * integer nano-nats (the tf-idf idiom), so ranking and output are
    * engine-exact.
    *
    * Scale: two word-keyed count aggregates, two word-keyed joins of
    * COUNT tables, a broadcast 1-row N, one global top-k (TakeOrdered).
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
                   k: Int = 20): DataFrame = {
    val uni = df.select(explode(Dedup.shingles(col(textCol), 1)).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n_words"))
    // a sub-n text yields a 1-word "bigram" (the shingle contract);
    // empty tokens come from doubled separators — both excluded, and
    // mirrored in the oracle
    val big = df.select(explode(Dedup.shingles(col(textCol), 2)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
      .groupBy("g").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    big
      .withColumn("wa", split(col("g"), " ").getItem(0))
      .withColumn("wb", split(col("g"), " ").getItem(1))
      .where(col("wa") =!= "" && col("wb") =!= "")
      .join(uni.select(col("w").as("wa"), col("c").as("c_a")), "wa")
      .join(uni.select(col("w").as("wb"), col("c").as("c_b")), "wb")
      .crossJoin(broadcast(n))
      .withColumn("__q", floor(log(col("c_ab").cast("double") *
          col("n_words") / (col("c_a").cast("double") * col("c_b")))
          * 1e9 + 0.5).cast("long"))
      .orderBy(col("__q").desc, col("g"))
      .limit(k)
      .select(col("g").as("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        zround(col("__q").cast("double") / 1e9, 6).as("pmi_nats"))
  }

  /** "Fightin' Words" (Monroe, Colaresi & Quinn 2008): per source, the
    * top-`k` words most over-represented vs the REST of the corpus by
    * the log-odds-ratio z-score with a flat Dirichlet prior
    * (α_w = 1, α0 = |vocab|):
    * δ_w = ln((y+1)/(n+V−y−1)) − ln((y'+1)/(n'+V−y'−1)),
    * σ² ≈ 1/(y+1) + 1/(y'+1), z = δ/√σ² — the statistically-grounded
    * alternative to per-source tf-idf for corpus comparison cards.
    * Each ln runs on exact integer arguments and is quantized to
    * nano-nats per term before the difference; √ is IEEE-pinned, so z
    * is ONE final double formula both engines compute identically.
    *
    * Scale: one (source, word) count aggregate, word- and source-keyed
    * joins of COUNT tables, a per-source rank window over the vocab.
    */
  def fightinWords(df: DataFrame, textCol: String, groupCol: String,
                   minCount: Long = 5L, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def qln(x: Column) = floor(log(x.cast("double")) * 1e9 + 0.5)
      .cast("long")
    val sw = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("src"),
        explode(Dedup.shingles(col(textCol), 1)).as("w"))
      .where(col("w") =!= "")
      .groupBy("src", "w").agg(count(lit(1)).as("y"))
    val gw = sw.groupBy("w").agg(sum(col("y")).as("gy"))
      .where(col("gy") >= minCount)
    // EVERY total (per-source n, grand nn, vocab V) is over the
    // min-count vocab — mixing an unfiltered n with a filtered nn
    // would drive the rest-corpus total negative for small sources
    val swf = sw.join(gw, "w")
    val ns = swf.groupBy("src").agg(sum(col("y")).as("n"))
    val tot = gw.agg(sum(col("gy")).as("nn"),
      count(lit(1)).as("v"))
    val scored = swf.join(ns, "src")
      .crossJoin(broadcast(tot))
      .withColumn("__yr", col("gy") - col("y"))
      .withColumn("__nr", col("nn") - col("n"))
      .withColumn("__dq",
        qln(col("y") + 1L) - qln(col("n") + col("v") - col("y") - 1L)
          - qln(col("__yr") + 1L)
          + qln(col("__nr") + col("v") - col("__yr") - 1L))
      .withColumn("z", zround((col("__dq").cast("double") / 1e9)
        / sqrt(lit(1.0) / (col("y") + 1L) + lit(1.0) / (col("__yr") + 1L)),
        6))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("src")
        .orderBy(col("z").desc, col("w"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("src").as(groupCol), col("rank"), col("w").as("word"),
        col("y"), col("z"))
  }
}
