package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is narrow (per-row expressions over built-ins, fully inside
  * whole-stage codegen): at 100 TB these run at parquet-scan speed with zero
  * shuffle; only a downstream groupBy/sort (caller's choice) is wide.
  */
object TextAnalysis {

  // ---------------------------------------------------------------------------
  // Token counting
  // ---------------------------------------------------------------------------

  /** Whitespace token count. */
  def wsTokens(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0))

  /** BPE-ish subword count: word-piece regex (letter runs / digit runs /
    * single punctuation marks), the standard pre-tokenization shape of GPT-2
    * style tokenizers.
    */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{Nd}]+|[^\\s\\p{L}\\p{Nd}]"), lit(0)))

  // ---------------------------------------------------------------------------
  // Quality scoring
  // ---------------------------------------------------------------------------

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")

  /** Heuristic quality features: length, word stats, punctuation / digit /
    * uppercase ratios, stopword ratio, mean word length. Returns the input
    * plus feature columns.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // r18 optimization: regexp_extract_all of the ALLOWED-run class is the
    // exact complement of split-on-separators with empties filtered (maximal
    // runs either way), and it is one codegen'd regex pass — the previous
    // `filter(split(...), w => length(w) > 0)` ran an interpreted ArrayFilter
    // lambda per word. Σ word lengths = length(array_join(words, "")) — one
    // codegen'd concat pass instead of an interpreted `aggregate` lambda.
    val words = regexp_extract_all(lower(t), lit("[\\p{L}\\p{Nd}']+"), lit(0))
    val nw = size(words)
    val sw = array(stopwords.map(lit): _*)
    df.withColumn("n_chars", length(t).cast(LongType))
      .withColumn("n_words", nw.cast(LongType))
      .withColumn("mean_word_len",
        when(nw > 0, length(array_join(words, "")).cast(LongType).cast(DoubleType) / nw.cast(DoubleType)))
      .withColumn("punct_ratio",
        when(length(t) > 0, size(regexp_extract_all(t, lit("[\\p{Punct}]"), lit(0))).cast(DoubleType)
          / length(t).cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(length(t) > 0, size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast(DoubleType)
          / length(t).cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("upper_ratio",
        when(length(t) > 0, size(regexp_extract_all(t, lit("[A-Z]"), lit(0))).cast(DoubleType)
          / length(t).cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nw > 0, size(filter(words, w => array_contains(sw, w))).cast(DoubleType) / nw.cast(DoubleType))
          .otherwise(lit(0.0)))
  }

  /** χ² term–label association (the classic feature-selection statistic —
    * Yang & Pedersen, ICML'97): for every (token, label) presence cell, the
    * 2×2 contingency χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), where a =
    * docs of the label containing the token, using doc-level PRESENCE (not
    * term frequency). Emits each label's `topK` most label-associated tokens
    * — the report that tells a mixture designer which vocabulary each source
    * contributes, and a classifier builder which features discriminate.
    *
    * CONTRACT (r19, advisor note): `idCol` must be the row identity and
    * `labelCol` a per-doc attribute — i.e. each doc id carries exactly ONE
    * label. The single-pass shape derives doc_freq(token) as
    * Σ_label n_with(token, label), which double-counts a doc id that
    * appeared under two labels; callers with multi-labeled docs must
    * pre-dedup to one label per id (every current caller satisfies this by
    * construction — doc_id is the documents table's primary key).
    *
    * Determinism/cross-engine: every input to the formula is an exact
    * integer count; the χ² itself is ONE fixed-shape double expression
    * (casts before multiplies, (A·D)−(B·C) parenthesization) evaluated
    * identically by both engines — bit-identical, so even the rank window
    * on the double is oracle-stable. Ubiquitous tokens (df = N) and
    * degenerate labels (n_label = N) are filtered: their denominator is 0
    * and their signal is definitionally zero.
    *
    * Scale: doc-level presence = one distinct on (doc, label, token) — the
    * same shuffle class as TF-IDF's df pass; label totals and N are
    * broadcast scalars; the per-label top-k collapses to a WindowGroupLimit
    * (no full sort materializes). Nothing is quadratic: cells are bounded by
    * distinct (token, label) pairs actually observed.
    */
  def chi2Terms(df: DataFrame, textCol: String, idCol: String,
      labelCol: String, minDf: Int, topK: Int): DataFrame = {
    // r18 optimization: ONE tokenize+distinct pass. The former shape ran
    // docTok's explode+distinct TWICE (token totals and per-(token,label)
    // cells were independent aggregations over it) and used countDistinct
    // (an Expand-based distinct-agg) over a frame already distinct on
    // (__id, label, token), where count(*) is exactly equal. Token totals
    // re-aggregate the cells: each doc carries exactly ONE label (idCol is
    // the row identity and labelCol a per-doc attribute — true of every
    // caller), so Σ_label n_with(token, label) = doc_freq(token) exactly.
    // Plan: 2 corpus scans + 4 exchanges → 1 corpus scan (AQE reuses the
    // (token,label) exchange for both consumers) + re-agg of a vocab-scale
    // frame; integer counts, value-identical (oracle hash unchanged).
    val docTok = df.select(col(idCol).as("__id"), col(labelCol).as("label"),
      explode(Dedup.tokens(col(textCol))).as("token")).distinct()
    val docs = df.select(col(idCol).as("__id"), col(labelCol).as("label"))
    val n = docs.agg(countDistinct(col("__id")).as("__n"))
    val labelTotals = docs.groupBy("label")
      .agg(countDistinct(col("__id")).as("n_label"))
    // localCheckpoint (lazy): TWO consumers (token totals, the cells join)
    // — and join-side IsNotNull pushdown makes the subtrees non-identical,
    // so ReuseExchange can NOT serve them from one exchange (verified in
    // the r18 plan dump); without the cut the tokenize+distinct ran twice.
    // The frame is vocabulary×label scale — the r14 dedupedPostings rule.
    val cells0 = docTok.groupBy("token", "label")
      .agg(count(lit(1)).as("n_with"))
      .localCheckpoint(false)
    val tokTotals = cells0.groupBy("token")
      .agg(sum(col("n_with")).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val cells = cells0
      .join(tokTotals, Seq("token"))
      .join(broadcast(labelTotals), Seq("label"))
      .crossJoin(broadcast(n))
      .filter(col("doc_freq") < col("__n") && col("n_label") < col("__n"))
    val A = col("n_with").cast(DoubleType)
    val B = (col("doc_freq") - col("n_with")).cast(DoubleType)
    val C = (col("n_label") - col("n_with")).cast(DoubleType)
    val D = (col("__n") - col("doc_freq") - col("n_label") + col("n_with"))
      .cast(DoubleType)
    val adbc = A * D - B * C
    val chi2 = col("__n").cast(DoubleType) * (adbc * adbc) /
      (col("doc_freq").cast(DoubleType) *
        (col("__n") - col("doc_freq")).cast(DoubleType) *
        col("n_label").cast(DoubleType) *
        (col("__n") - col("n_label")).cast(DoubleType))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chi2").desc, col("token").asc)
    cells.withColumn("chi2", chi2)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("label"), col("token"), col("n_label"), col("doc_freq"),
        col("n_with"), col("chi2"), col("rank"))
  }

  /** Corpus vocabulary statistics: token frequencies ranked (count desc,
    * token asc — deterministic). One explode + one partial-aggregable count;
    * at 100 TB this is the canonical word-count shuffle, keyed on the token.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Hashing-trick bag-of-words vectorizer: each token maps to a fixed-size
    * bucket space via its md5 prefix (first 8 hex nibbles as a big-endian
    * int, mod `dim` — md5 because it is bit-identical in every engine,
    * unlike engine-private hash functions), and per-doc bucket counts are
    * the sparse feature rows a downstream model consumes.
    *
    * Scale: the whole point of the hashing trick at 100 TB — there is NO
    * vocabulary: no global dictionary build, no fit/transform phases, no
    * multi-GB vocab broadcast, no OOV path. One narrow tokenize+explode,
    * one (doc, bucket)-keyed partial-aggregable count. Collisions are the
    * accepted trade (Weinberger et al., "Feature Hashing for Large Scale
    * Multitask Learning", ICML'09).
    */
  def featureHash(df: DataFrame, textCol: String, idCol: String,
      dim: Int = 64): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("__tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast(LongType)
          % lit(dim.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** DSIR-style hashed-n-gram importance weights (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", NeurIPS 2023): score
    * each RAW document by how target-like its hashed unigram+bigram bucket
    * distribution is. Per bucket, λ(b) = ln p̂_target(b) − ln p̂_raw(b) with
    * add-1 smoothing over `dim` buckets (the [[featureHash]] md5-prefix map
    * — engine-portable, vocabulary-free); per document,
    * log w(x) = Σ_b c_x(b)·λ(b). Resampling ∝ w is the paper's second stage;
    * here the weight itself is the artifact (feed it to the Sampling family)
    * plus the exact-sign flag `target_like` (= the doc leans target rather
    * than raw-average).
    *
    * Cross-engine exactness: λ is computed with one libm `ln` per bucket,
    * rounded to 9 dp, and carried as DECIMAL(20,9) (the nDCG discount
    * idiom), so the per-doc sum is order-free; counts ride DECIMAL(10,0) so
    * the product stays at precision 31 ≤ 38 on both engines; `target_like`
    * compares the exact decimal, not the rounded double.
    *
    * Scale: two corpus-level bucket histograms (partial-aggregable, output
    * bounded by `dim`), a dim-row λ table broadcast onto the per-doc bucket
    * counts, one (doc, bucket) partial agg, one per-doc sum. No vocabulary
    * build, no global sort — the hashing trick keeps feature space O(dim)
    * at any corpus size.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, dim: Int = 64): DataFrame = {
    import graft.expressions.{GraftFunctions => G}
    val spark = raw.sparkSession
    def bucket(g: Column): Column =
      conv(substring(md5(g), 1, 8), 16, 10).cast(LongType) % dim
    def gramsOf(c: Column): Column = {
      val ts = Dedup.tokens(c)
      concat(G.ngramStrings(ts, 1), G.ngramStrings(ts, 2))
    }
    val docCounts = raw
      .select(col(idCol).as("doc_id"), explode(gramsOf(col(textCol))).as("__g"))
      .select(col("doc_id"), bucket(col("__g")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val tgtB = target.select(explode(gramsOf(col(textCol))).as("__g"))
      .select(bucket(col("__g")).as("b"))
    val tCounts = tgtB.groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = docCounts.groupBy("b").agg(sum(col("c")).as("cr"))
    val nt = tgtB.agg(count(lit(1)).as("nt"))
    val nr = docCounts.agg(sum(col("c")).cast(LongType).as("nr"))
    val dimD = lit(dim.toDouble)
    val lam = spark.range(dim).select(col("id").as("b"))
      .join(tCounts, Seq("b"), "left").join(rCounts, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + 1L).cast(DoubleType) /
            (col("nt").cast(DoubleType) + dimD)) -
          log((coalesce(col("cr"), lit(0L)) + 1L).cast(DoubleType) /
            (col("nr").cast(DoubleType) + dimD)), 9)
          .cast(DecimalType(20, 9)).as("lam"))
    docCounts.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast(LongType).as("n_grams"),
        sum(col("c").cast(DecimalType(10, 0)) * col("lam")).as("__w"))
      .select(col("doc_id"), col("n_grams"),
        round(col("__w").cast(DoubleType), 6).as("log_weight"),
        (col("__w") > 0).as("target_like"))
  }

  /** DSIR stage 2 — Gumbel top-k resampling over importance weights: each
    * doc draws a deterministic uniform from its id (the md5
    * [[Sampling.idHash]], so the draw is content-addressed and
    * engine-replayable), perturbs its log-weight with Gumbel noise
    * g = −ln(−ln u), and the top-k perturbed keys are the sample — the
    * standard Gumbel-max trick, equivalent to sampling without replacement
    * ∝ exp(w). Keys round at 6 dp with id tie-break, so selection is exact
    * cross-engine despite the libm lns.
    *
    * Scale: narrow per-row arithmetic + one TakeOrdered(k) — no global sort
    * materializes (k rows per partition reduce to k total).
    */
  def gumbelTopK(weights: DataFrame, idCol: String, wCol: String,
      k: Int): DataFrame = {
    val u = (Sampling.idHash(col(idCol)).cast(DoubleType) + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60 — u ∈ (0, 1), identical IEEE doubles
    weights
      .withColumn("gumbel_key", round(col(wCol) + round(-log(-log(u)), 9), 6))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col(wCol), col("gumbel_key"))
  }

  /** CCNet-style cross-entropy quality scoring (Wenzek et al. 2020): score
    * RAW documents under a bigram LM trained on the TARGET corpus — the
    * classic "perplexity under a clean-domain LM" filter signal (CCNet uses
    * a KenLM 5-gram; the add-1 bigram here is the same signal with exact,
    * engine-portable arithmetic). Unseen pairs/contexts back off to the
    * add-1 floor (c₂ = 0, c₁ = 0 ⇒ p = 1/(0 + V)). Each bigram's ln p
    * rounds to 9 dp and rides DECIMAL(20,9) so the per-doc sum is
    * order-free; the emitted mean rounds at 6.
    *
    * Scale: LM counts are vocabulary-bounded partial aggregates; scoring is
    * two (w1[, w2])-keyed joins against those count tables + one per-doc
    * agg. Nothing scales with corpus² and the raw corpus never re-shuffles
    * beyond its bigram stream.
    */
  def bigramCrossScore(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import graft.expressions.{GraftFunctions => G}
    def bg(df: DataFrame, idCols: Seq[Column]): DataFrame =
      df.select(idCols :+
          explode(G.ngramStrings(Dedup.tokens(col(textCol)), 2)).as("__bg"): _*)
        .select(idCols :+ substring_index(col("__bg"), " ", 1).as("w1") :+
          substring_index(col("__bg"), " ", -1).as("w2"): _*)
    val tgtBg = bg(target, Seq.empty)
    // r19 audit note: the chi2Terms re-agg shape (ctxCounts = Σ_w2 over a
    // checkpointed pairCounts) was TRIED and measured 2.5× SLOWER here
    // (0.38 → 0.94 s) — the target side is the small curated corpus, so the
    // checkpoint materialization costs more than the tokenize scan it
    // saves. Kept as two scans; at a large target the re-agg would win.
    val pairCounts = tgtBg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctxCounts = tgtBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = target.select(explode(Dedup.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    bg(raw, Seq(col(idCol).as("doc_id")))
      .join(pairCounts, Seq("w1", "w2"), "left")
      .join(ctxCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", round(
          log((coalesce(col("c2"), lit(0L)) + 1L).cast(DoubleType) /
            (coalesce(col("c1"), lit(0L)).cast(DoubleType) + col("v").cast(DoubleType))), 9)
        .cast(DecimalType(20, 9)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        round(sum(col("__lp")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("cross_lp"))
  }

  /** Pairwise vocabulary overlap between groups (sources, languages, shards):
    * token-set Jaccard per (group_a, group_b), `a < b`. The mixture-design
    * diagnostic — two sources with near-identical vocabularies are redundant
    * in a training mixture; near-zero overlap flags a domain/language outlier.
    *
    * All-integer arithmetic (distinct counts, one final exact int→double
    * division), so the result is bit-deterministic in any engine — no libm,
    * no sum-order sensitivity.
    *
    * Scale: the (group, token) frame distincts with partial aggregation, and
    * the token self-join's per-key fan-out is bounded by #groups² — a
    * CONSTANT in corpus size (20 sources → ≤400 rows per token regardless of
    * corpus rows). Nothing here is quadratic in data.
    */
  def groupVocabOverlap(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    // r19 audit note: a localCheckpoint on this 3-consumer frame was TRIED
    // and measured SLOWER at bench scale (0.58 → 0.74 s — the checkpoint
    // materialization exceeds the two saved tokenize scans here); left as
    // is. At corpus scale the cut wins — the r14 dedupedPostings law.
    val toks = df.select(col(groupCol).as("grp"), explode(Dedup.tokens(col(textCol))).as("tok"))
      .distinct()
    val sizes = toks.groupBy("grp").agg(count(lit(1)).as("sz"))
    val l = toks.select(col("tok"), col("grp").as("grp_a"))
    val r = toks.select(col("tok"), col("grp").as("grp_b"))
    val inter = l.join(r, Seq("tok"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("grp").as("grp_a"), col("sz").as("sz_a")), Seq("grp_a"))
      .join(sizes.select(col("grp").as("grp_b"), col("sz").as("sz_b")), Seq("grp_b"))
      .select(col("grp_a").as("group_a"), col("grp_b").as("group_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType)).as("vocab_jaccard"))
  }

  /** Pairwise total-variation distance between groups' token DISTRIBUTIONS —
    * the distribution-aware companion of [[groupVocabOverlap]]'s set Jaccard
    * (two sources can share a vocabulary yet use it with very different
    * frequencies; mixture design cares about both). Computed through the
    * inner-join-only identity `TV = ½·Σ|p−q| = 1 − Σ_matched min(p,q)`
    * (Σp = Σq = 1), so unmatched tokens never need a full-outer join, and
    * no logarithms (KL/JS would drag libm parity into the oracle).
    *
    * Scale: identical shape to [[groupVocabOverlap]] — (group, token) counts
    * with partial aggregation, token self-join fan-out bounded by #groups²
    * per token, min-sums through DECIMAL for order independence.
    */
  def groupDivergence(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val cnts = df.select(col(groupCol).as("grp"), explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("n"))
    val tots = cnts.groupBy("grp").agg(sum(col("n")).as("tot"))
    val probs = cnts.join(tots, Seq("grp"))
      .select(col("grp"), col("tok"),
        (col("n").cast(DoubleType) / col("tot").cast(DoubleType)).as("p"))
    val l = probs.select(col("tok"), col("grp").as("group_a"), col("p").as("pa"))
    val r = probs.select(col("tok"), col("grp").as("group_b"), col("p").as("pb"))
    l.join(r, Seq("tok")).filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(least(col("pa"), col("pb")).cast(DecimalType(30, 6))).as("__s"))
      .select(col("group_a"), col("group_b"),
        (lit(1.0) - col("__s").cast(DoubleType)).as("tv_distance"))
  }

  /** TF-IDF top terms per document: term frequency within the doc, document
    * frequency across the corpus, `tfidf = tf · N / df` (kept as one exact
    * integer product and one IEEE division so both engines produce the same
    * double bit for bit — a log-idf would hinge on libm rounding), and the
    * top-`k` terms per doc by (tfidf desc, token asc).
    *
    * Scale (100 TB): `tf` is the canonical word-count shuffle keyed on
    * (doc, token) with map-side partial aggregation; `df` re-aggregates the
    * already-distinct (doc, token) pairs, so it never re-touches raw text.
    * The vocabulary join is Zipf-small after any min-df pruning — AQE
    * broadcasts it; the final per-doc top-k is a bounded window on the doc
    * key.
    *
    * @param corpusN corpus size for the idf numerator; when absent, N is
    *                computed INSIDE the plan (a broadcast scalar aggregate) —
    *                never as an eager `count()` action, which would re-execute
    *                the input's whole upstream plan once per call when `df` is
    *                a derived frame (filtered/deduped), doubling the corpus
    *                scan at scale.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int,
      corpusN: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val nDf = corpusN match {
      case Some(n) => df.sparkSession.range(1).select(lit(n).as("__n"))
      case None => df.agg(count(lit(1)).as("__n"))
    }
    // document frequency as a count window over the token partition of the
    // SAME tf frame (tf has exactly one row per (doc, token)) — through
    // round 8 this was a second aggregate + a join back, which cost an extra
    // exchange + broadcast build and evaluated the tf plan twice when the
    // exchange didn't reuse
    val wDf = Window.partitionBy("token")
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token").asc)
    tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        (col("tf") * col("__n")).cast(DoubleType) / col("df").cast(DoubleType))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast(LongType).as("rnk"),
        col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Within-document repetition stats (RefinedWeb/Gopher-style repetition
    * filters): total vs distinct word n-grams and their ratio. High
    * `dup_ngram_ratio` marks boilerplate/templated documents. Narrow — ONE
    * kernel pass per row ([[graft.expressions.ShingleStats]]), zero shuffle.
    * The struct is projected in its own select so CollapseProject (which
    * refuses to duplicate non-cheap expressions referenced more than once)
    * keeps the tokenizer+kernel evaluated exactly once per row.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val st = graft.expressions.GraftFunctions.shingleStats(Dedup.tokens(col(textCol)), n)
    df.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st.n_ngrams").as("n_ngrams"),
        col("__st.n_distinct_ngrams").as("n_distinct_ngrams"))
      .withColumn("dup_ngram_ratio",
        when(col("n_ngrams") > 0,
          lit(1.0) - col("n_distinct_ngrams").cast(DoubleType) / col("n_ngrams").cast(DoubleType))
          .otherwise(lit(0.0)))
  }

  /** PII patterns kept to syntax with identical semantics in Java regex and
    * RE2 (no lookarounds), so scrubbing is oracle-reproducible.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** PII scrubbing: replace email/IP patterns with placeholder tokens and
    * count the redactions per document. Narrow regexp passes — at 100 TB this
    * runs at scan speed; add patterns to [[piiPatterns]] to extend.
    */
  def scrubPii(df: DataFrame, textCol: String, outCol: String = "scrubbed"): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType).as(s"n_$name")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(scrubbed.as(outCol)) ++ counts: _*)
  }

  /** Quality-filter decision (Gopher-rule shape): the feature columns of
    * [[qualityFeatures]] folded into a keep/drop verdict plus the FIRST
    * failing rule as `drop_reason` (null when kept) — the audit trail a
    * corpus-curation pipeline logs per document. Pure narrow expressions.
    */
  def qualityFilter(df: DataFrame, textCol: String,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      maxDigitRatio: Double = 0.3, maxPunctRatio: Double = 0.25): DataFrame = {
    val f = qualityFeatures(df, textCol)
    val reason = when(col("n_words") < minWords, "too_few_words")
      .when(col("n_words") > maxWords, "too_many_words")
      .when(col("mean_word_len") < minMeanWordLen || col("mean_word_len") > maxMeanWordLen,
        "word_len_out_of_range")
      .when(col("digit_ratio") > maxDigitRatio, "too_many_digits")
      .when(col("punct_ratio") > maxPunctRatio, "too_much_punct")
    f.withColumn("drop_reason", reason).withColumn("keep", reason.isNull)
  }

  // ---------------------------------------------------------------------------
  // Language identification (n-gram/marker-word heuristic)
  // ---------------------------------------------------------------------------

  /** Per-language marker words for a lightweight language-ID vote. Ordered —
    * ties break toward the earlier language, deterministically.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "como", "por", "del", "más"),
    "it" -> Seq("il", "di", "che", "è", "per", "con", "del", "sono", "una", "non")
  )

  /** Predicted language: argmax over distinct-marker-word hit counts; ties
    * break toward the earlier language in [[langMarkers]]; `und`(etermined)
    * when nothing matches.
    *
    * One precompiled kernel pass ([[graft.expressions.LangId]]) over the
    * Spark-`lower`ed text — the round-2..4 formulation (`split` +
    * `array_intersect` per language) ran interpreted, with CollapseProject
    * re-inlining the split into all five intersects: ~10 s at sf0.1 vs scan
    * speed here. Semantics are identical (same tokenization regex class,
    * distinct-token scoring, same tie-break), pinned by the unchanged DuckDB
    * oracle.
    */
  def langId(text: Column): Column =
    graft.expressions.GraftFunctions.langId(lower(text), langMarkers)

  // ---------------------------------------------------------------------------
  // Corpus n-gram statistics and rarity scoring
  // ---------------------------------------------------------------------------

  /** Corpus-wide top-k bigram counts. Bigrams are formed by the codegen'd
    * [[graft.expressions.NgramStrings]] kernel — one narrow pass per document
    * at scan speed. Through round 7 this paired tokens with `lead` over a
    * (doc, position) window, which cost a full doc-keyed shuffle + sort whose
    * only job was adjacency; the kernel removes that shuffle entirely, so the
    * plan is explode → the canonical count shuffle (map-side partial agg) →
    * a driver-bounded `limit` for top-k.
    */
  def topBigrams(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(explode(graft.expressions.GraftFunctions
        .ngramStrings(Dedup.tokens(col(textCol)), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(k)

  /** Collocation strength for the corpus's bigrams — the PMI family's "lift":
    * `lift(a,b) = p(ab) / (p(a)·p(b))` with `p(ab) = n_ab/N` over bigram
    * occurrences and `p(w) = n_w/U` over unigram occurrences. Reported as the
    * raw ratio rather than its log: every input is an integer count, so the
    * fixed double expression tree is bit-identical across engines, where
    * `ln()` is only 1-ulp-accurate and libm-dependent (the same reasoning as
    * [[docRarity]]'s integer ranks). `lift > 1` ⇔ positive PMI.
    *
    * Plan (r19 optimization, guide §2.4): ONE corpus scan — the bigram and
    * unigram occurrences ride one exploded `concat(ngrams, tokens)` array
    * into one count shuffle (tokens are `[\p{L}\p{Nd}]+`, so "contains a
    * space" splits the counted vocabulary back into the two frames
    * exactly); the combined counts frame is vocabulary-scale and feeds four
    * consumers (both totals, both vocabulary joins), so it takes the r14
    * dedupedPostings `localCheckpoint` — without the cut the corpus agg
    * re-runs per consumer. Then the two vocabulary equi-joins to attach
    * `n_a`/`n_b`, one broadcast of the two scalar totals, and a TakeOrdered
    * top-k — no per-pair state, nothing quadratic. The `minCount` support
    * floor is applied AFTER the totals are taken, so probabilities stay
    * calibrated to the full corpus. (The former shape ran the
    * tokenize+explode corpus scan TWICE — once per n-gram order.)
    */
  def bigramLift(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 100): DataFrame = {
    val toks = df.select(Dedup.tokens(col(textCol)).as("__ts"))
    val counts = toks.select(explode(concat(graft.expressions.GraftFunctions
        .ngramStrings(col("__ts"), 2), col("__ts"))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val bc = counts.filter(col("g").contains(" "))
      .select(col("g").as("bigram"), col("cnt").as("n_ab"))
    val uc = counts.filter(!col("g").contains(" "))
      .select(col("g").as("token"), col("cnt").as("n"))
    val tot = bc.agg(sum("n_ab").cast(DoubleType).as("__N"))
      .crossJoin(uc.agg(sum("n").cast(DoubleType).as("__U")))
    val left = uc.select(col("token").as("__w1"), col("n").as("n_a"))
    val right = uc.select(col("token").as("__w2"), col("n").as("n_b"))
    bc.filter(col("n_ab") >= minCount)
      // tokens are [\p{L}\p{Nd}]+ so the single space is an unambiguous
      // bigram separator
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__w2", split(col("bigram"), " ").getItem(1))
      .join(left, Seq("__w1")).join(right, Seq("__w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        (((col("n_ab").cast(DoubleType) * col("__U")) /
          col("n_a").cast(DoubleType)) * col("__U") /
          col("n_b").cast(DoubleType)) / col("__N"))
      .select("bigram", "n_ab", "n_a", "n_b", "lift")
      .orderBy(col("lift").desc, col("bigram").asc)
      .limit(k)
  }

  /** Per-document n-gram novelty: the share of a document's DISTINCT word
    * n-gram shingles that appear in no other document (corpus docFreq = 1) —
    * the memorization/novelty signal of a training-data audit (a near-zero
    * share means the document is assembled from passages seen elsewhere;
    * [[Dedup.duplicatedSpans]] finds the passages, this scores the document).
    *
    * Shape: a shingle with docFreq = 1 has exactly one owner, so `min(doc_id)`
    * inside the docFreq aggregate IS the attribution — no shingle-keyed join
    * back to the corpus exists in the plan. Two partial-aggregable shuffles
    * (per-shingle, then per-doc) plus a doc-count-sized left join; the hot
    * Zipf-head shingles that skew inverted-index joins only ever contribute
    * to the docFreq aggregate, where map-side combine absorbs them.
    *
    * Shingle semantics match [[Dedup.shingleHashSet]]: documents shorter than
    * n yield their whole token list as one shingle (empty docs share the ""
    * shingle, which is then by construction non-novel if two exist).
    */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String,
      n: Int = 5): DataFrame = {
    // codegen'd kernel n-grams plus the explicit short-doc fallback —
    // string-identical to Dedup.shingles without its interpreted lambda
    val toks = Dedup.tokens(col(textCol))
    val sh = when(size(toks) - (n - 1) <= 0, array(array_join(toks, " ")))
      .otherwise(graft.expressions.GraftFunctions.ngramStrings(toks, n))
    val base = df.select(col(idCol).as("doc_id"), array_distinct(sh).as("__sh"))
    // per-doc total is a per-row expression — narrow, never shuffled
    val tot = base.select(col("doc_id"), size(col("__sh")).cast(LongType).as("n_shingles"))
    val novel = base.select(col("doc_id"), explode(col("__sh")).as("__s"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__dfreq"), min(col("doc_id")).as("doc_id"))
      .filter(col("__dfreq") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("__novel"))
    tot.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("__novel"), lit(0L)))
      .withColumn("novel_share",
        col("n_novel").cast(DoubleType) / col("n_shingles").cast(DoubleType))
      .select("doc_id", "n_shingles", "n_novel", "novel_share")
  }

  /** Per-document token-rarity profile: every token's corpus frequency rank
    * (1 = most frequent, ties broken by token text — a deterministic integer
    * domain, unlike log-probabilities whose libm rounding differs across
    * engines), aggregated per document into mean rank, unique-token count and
    * the rarest token's corpus frequency. The rarity rank is the integer
    * backbone of a unigram LM score: `rank ≈ exp(surprisal)` order-equivalent
    * under Zipf, with none of the float-parity risk.
    *
    * Scale: the global (freq desc, token asc) rank over the vocabulary uses
    * the same two-level row_number as [[graft.operators.Sampling.deterministicShuffle]]
    * — rank within (freq, token-prefix) groups plus broadcast cumulative
    * offsets — so no single-task vocabulary sort exists even at web-corpus
    * vocabulary sizes, and the freq=1 Zipf tail (half the vocabulary in one
    * frequency class) is split across prefix groups instead of one task.
    * The ranked vocabulary is Zipf-small and broadcast back to the token
    * stream.
    */
  def docRarity(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("token"))
    // r18 optimization: ONE tokenize pass. The vocabulary re-aggregates the
    // (doc, token) occurrence counts (freq = Σ per-doc counts, exactly) —
    // the former groupBy("token") over the raw token stream was a second
    // full explode+scan; AQE's ReuseExchange serves both consumers from the
    // one (doc_id, token) exchange.
    // localCheckpoint (lazy) on BOTH shared frames: pairCnt feeds the
    // vocabulary AND the rank join, vocab feeds the within-group ranks AND
    // the carry offsets — per-branch filter pushdown makes the duplicated
    // subtrees non-identical so ReuseExchange cannot serve them (r18 plan
    // dump), and uncut each consumer re-ran the full tokenize scan.
    val pairCnt = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false)
    val vocab = pairCnt.groupBy("token").agg(sum(col("__cnt")).as("freq"))
      .localCheckpoint(false)
    // Two-level global rank by (freq desc, token asc): group = (freq, 1-char
    // token prefix); within-group row_number + cumulative group offsets.
    val grouped = vocab.withColumn("__pfx", substring(col("token"), 1, 1))
    val wIn = Window.partitionBy(col("freq"), col("__pfx")).orderBy(col("token"))
    val local = grouped.withColumn("__rn", row_number().over(wIn).cast(LongType))
    val wCarry = Window.orderBy(col("freq").desc, col("__pfx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = grouped.groupBy(col("freq"), col("__pfx"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wCarry), lit(0L)))
      .select(col("freq"), col("__pfx"), col("__off"))
    val ranked = local.join(broadcast(carries), Seq("freq", "__pfx"))
      .withColumn("rank", col("__off") + col("__rn"))
      .select(col("token"), col("freq"), col("rank"))
    // No broadcast hint on the vocabulary join: it is Zipf-small at test SF
    // (AQE broadcasts it), but at web-corpus scale a 10^7-token vocabulary
    // belongs in a shuffle join — AQE decides from runtime stats.
    //
    // Aggregate occurrences to (doc, token) BEFORE the rank join: the join
    // then probes one row per distinct pair instead of one per occurrence,
    // and the final per-doc aggregate needs no countDistinct (n_unique is a
    // plain count over the pre-distinct frame — no Expand). Integer parity:
    // sum(rank·cnt) over longs is exactly the occurrence-row sum(rank).
    pairCnt
      .join(ranked, Seq("token"))
      .groupBy("doc_id")
      .agg(sum(col("__cnt")).cast(LongType).as("n_tokens"),
        count(lit(1)).cast(LongType).as("n_unique"),
        (sum(col("rank") * col("__cnt")).cast(DoubleType) /
          sum(col("__cnt")).cast(DoubleType)).as("mean_rank"),
        min(col("freq")).as("min_freq"))
  }

  /** Code-point Shannon entropy of the text (bits) — the gibberish /
    * repeated-character-spam quality signal. One precompiled kernel pass
    * ([[graft.expressions.CharEntropy]]); consumers should round (libm
    * `log` differs across engines in the last ulp).
    */
  def charEntropy(text: Column): Column =
    graft.expressions.GraftFunctions.charEntropy(text)

  /** Per-document mean bigram log-probability under an add-one-smoothed
    * bigram model trained on the corpus itself — the KenLM-shaped fluency
    * score of CCNet-style quality pipelines, self-contained (no external
    * model artifact):
    * `p(w2|w1) = (C(w1,w2) + 1) / (C(w1,·) + V)`, score = mean over the
    * document's bigrams of ln p. Documents with < 2 tokens produce no
    * bigrams and are therefore ABSENT from the output (group-by semantics);
    * left-join the result back to the corpus to surface them as null scores.
    *
    * Shape: bigrams from the narrow [[graft.expressions.NgramStrings]] kernel
    * (tokens carry no spaces, so `substring_index` splits the pair back into
    * (w1, w2) unambiguously — no per-doc window shuffle, same as
    * [[topBigrams]]), a (w1,w2) count aggregate, the context count C(w1,·)
    * as a window sum over the w1 partition of that SAME aggregate (no second
    * join), vocab size V as a broadcast 1-row cross join, then the
    * doc-bigram stream re-joins the probability table on (w1,w2) — co-keyed
    * with the count shuffle. At web scale the bigram table is Zipf-heavy but
    * bounded by distinct pairs, and AQE picks broadcast vs shuffle join from
    * stats.
    *
    * Float parity: ln + a sum whose accumulation order is engine-chosen —
    * the emitted score must be rounded (the shipped query rounds to 6 dp;
    * addends are O(1) and doc bigram counts are O(100), so the fp spread is
    * ~1e-13 against a 5e-7 rounding boundary).
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bigrams = df.select(col(idCol).as("doc_id"),
        explode(graft.expressions.GraftFunctions
          .ngramStrings(Dedup.tokens(col(textCol)), 2)).as("bg"))
      .select(col("doc_id"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val pairCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val wCtx = Window.partitionBy("w1")
    val probs = pairCounts.withColumn("c1", sum(col("c2")).over(wCtx))
    val vocab = df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    val scored = bigrams.join(probs, Seq("w1", "w2")).crossJoin(broadcast(vocab))
      .withColumn("__lp",
        log((col("c2") + lit(1.0)) / (col("c1").cast(DoubleType) + col("v").cast(DoubleType))))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        (sum(col("__lp")) / count(lit(1)).cast(DoubleType)).as("mean_lp"))
  }

  // ---------------------------------------------------------------------------
  // Document fingerprinting
  // ---------------------------------------------------------------------------

  /** Polynomial rolling-hash fingerprint over the word sequence:
    * `h = (h*31 + (md5hex15(word) mod 2^30)) mod (2^31-1)`. Order-sensitive
    * (unlike a bag-of-words hash); computed by the precompiled
    * [[graft.expressions.RollingFingerprint]] kernel. MD5-derived word hashes
    * make it bit-reproducible in DuckDB (md5 hex-digit folds), so the emitted
    * fingerprints are oracle-checked exactly.
    */
  def fingerprint(text: Column): Column =
    graft.expressions.GraftFunctions.rollingFingerprint(Dedup.tokens(text))

  /** Content fingerprint (exact-dup detection key): MD5 hex of the
    * whitespace-normalized lowercased text — oracle-reproducible (`md5()` in
    * both engines).
    */
  def contentHash(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  // ---------------------------------------------------------------------------
  // Zipf-law fit
  // ---------------------------------------------------------------------------

  /** Per-group Zipf exponent: OLS fit of ln(freq) on ln(rank) over each
    * group's `topK` most frequent tokens (rank ties broken by token text —
    * deterministic). A natural corpus fits slope ≈ −1; a strongly deviating
    * slope flags template/generated text (too flat: vocabulary artificially
    * uniform; too steep: a few tokens dominate). Emits
    * (group, n_ranked, slope, intercept), both coefficients rounded(6).
    *
    * Scale: the token-frequency aggregation is partial-aggregable; the
    * row_number window runs per group over VOCABULARY-sized data (tokens,
    * not occurrences) and cuts to topK immediately. At web scale one would
    * pre-prune the vocab with a min-count filter before the window; the
    * regression itself is a 5-sum aggregate over ≤ topK rows per group.
    */
  def zipfFit(df: DataFrame, textCol: String, groupCol: String,
      topK: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("group")
      .orderBy(col("freq").desc, col("token"))
    val ranked = df
      .select(col(groupCol).as("group"), explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("group", "token").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
    val x = log(col("rank").cast(DoubleType))
    val y = log(col("freq").cast(DoubleType))
    ranked.groupBy("group")
      .agg(count(lit(1)).as("n_ranked"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .withColumn("__nd", col("n_ranked").cast(DoubleType))
      .withColumn("slope",
        (col("__nd") * col("sxy") - col("sx") * col("sy")) /
          (col("__nd") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("__nd"))
      .select(col("group"), col("n_ranked"),
        round(col("slope"), 6).as("slope"), round(col("intercept"), 6).as("intercept"))
  }

  // ---------------------------------------------------------------------------
  // Boilerplate detection (C4/RefinedWeb-style, source-conditioned)
  // ---------------------------------------------------------------------------

  /** Per-source boilerplate n-grams: phrases whose within-source document
    * frequency share exceeds `minShare` — headers, footers, navigation and
    * license text that a single crawl source stamps onto most of its pages.
    * This is the frequency-based complement of [[Dedup.duplicatedSpans]]:
    * spans mark text duplicated ANYWHERE ≥2 times, boilerplate marks text
    * common WITHIN a source by df ratio, which survives even when each
    * occurrence's surrounding context differs. (The classic C4 rule is
    * line-level "seen in ≥3 docs"; this corpus has no line structure, so the
    * unit is the word n-gram.)
    *
    * Returns (source, gram, df, n_docs, share): one row per boilerplate
    * phrase. Docs shorter than n contribute no grams but DO count in n_docs
    * (they can't carry phrase boilerplate, but they are documents).
    *
    * Scale: per-doc gram sets are distinct'd map-side (array_distinct, no
    * shuffle), the df aggregation is partial-aggregable on (source, gram),
    * and the per-source totals frame is #sources rows — broadcast. Nothing
    * is quadratic; Zipf-head grams collapse in map-side combine. The shuffle
    * key is the gram STRING (n small → short keys) so the report is directly
    * readable; a 100 TB run keying on 128-bit gram hashes would carry
    * `first(gram)` through the aggregate instead.
    */
  def boilerplate(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String, n: Int = 2, minShare: Double = 0.2,
      minDf: Int = 2): DataFrame = {
    val base = df.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
      array_distinct(graft.expressions.GraftFunctions
        .ngramStrings(Dedup.tokens(col(textCol)), n)).as("__sh"))
    val nDocs = base.groupBy("source").agg(count(lit(1)).as("n_docs"))
    base.select(col("source"), explode(col("__sh")).as("gram"))
      .groupBy("source", "gram").agg(count(lit(1)).as("df"))
      .join(broadcast(nDocs), Seq("source"))
      .withColumn("share", col("df").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .filter(col("df") >= minDf && col("share") >= minShare)
      .select(col("source"), col("gram"), col("df"), col("n_docs"),
        round(col("share"), 6).as("share"))
  }

  /** Apply a [[boilerplate]] phrase list: drop every token position covered
    * by an occurrence of one of its source's boilerplate grams and reassemble
    * the rest in order. A document whose every token is covered has no
    * surviving tokens and is ABSENT from the output (generator semantics,
    * like [[Dedup.removeSpans]]).
    *
    * Scale: the phrase list is broadcast (bounded by #sources × the share
    * threshold), so marking costs no shuffle — the plan's only wide ops are
    * the covered-position distinct and the per-doc reassembly, both keyed on
    * doc_id.
    */
  def boilerplateScrub(df: DataFrame, phrases: DataFrame, textCol: String,
      idCol: String, sourceCol: String, n: Int = 2): DataFrame = {
    val toksArr = Dedup.tokens(col(textCol))
    val posts = df.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
      posexplode(graft.expressions.GraftFunctions.ngramStrings(toksArr, n))
        .as(Seq("pos", "gram")))
    val covered = posts
      .join(broadcast(phrases.select("source", "gram")), Seq("source", "gram"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    df.select(col(idCol).as("doc_id"), posexplode(toksArr).as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      // GetArrayStructFields (codegen'd) instead of an interpreted
      // per-token `transform` lambda (r18 optimization)
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .getField("tok"), " ").as("clean_text"),
        count(lit(1)).as("n_tokens_kept"))
  }

  // ---------------------------------------------------------------------------
  // Subword tokenizer APPLY (greedy longest-match against a learned vocab)
  // ---------------------------------------------------------------------------

  /** Character n-grams of a (single-word) string column in document order;
    * empty array when the word is shorter than `n`. Code-point positions
    * (Spark `length`/`substr` semantics — the unit the DuckDB dual shares).
    */
  def charGrams(word: Column, n: Int): Column =
    when(length(word) >= n,
      transform(sequence(lit(1), length(word) - (n - 1)), i => word.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Ranked vocabulary candidates: `(kind, value, rank)` for the top `top`
    * entries of each kind ("w" whole words, "3"/"2" char grams), rank =
    * count desc then value asc within the kind. ONE job, one kernel pass:
    * every doc emits its kind-prefixed candidate entries
    * ([[graft.expressions.VocabGramEntries]] — a lambda formulation here ran
    * ~1.25M interpreted evals at sf0.1) → one entry-count shuffle → per-kind
    * top-k; the literal `rn <= top` predicate is what InferWindowGroupLimit
    * needs to push a rank limit below the sort, so no per-kind full sort
    * materializes. Only the top few hundred strings land on the driver (the
    * k-centers / BPE-merge literal-shipping pattern). Slicing `rank <= k`
    * per kind yields the vocabulary at any size `k <= top`, which is how
    * the vocab-size curve learns once and encodes at every size.
    */
  def subwordVocabRanked(df: DataFrame, textCol: String, top: Int): Seq[(String, String, Int)] = {
    import graft.expressions.{GraftFunctions => G}
    val wk = Window.partitionBy(substring(col("e"), 1, 1))
      .orderBy(col("c").desc, col("e").asc)
    df.select(explode(G.vocabGramEntries(Dedup.tokens(col(textCol)))).as("e"))
      .groupBy("e").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= top)
      .select(substring(col("e"), 1, 1).as("kind"),
        expr("substring(e, 2)").as("v"), col("rn"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
  }

  /** The vocabulary at size `k` from a [[subwordVocabRanked]] listing:
    * per-kind `rank <= k` slices in (words, 3-grams, 2-grams) order,
    * cross-kind deduped — identical to [[subwordVocab]] at `(k, k)`.
    */
  def vocabAtSize(ranked: Seq[(String, String, Int)], k: Int): Seq[String] = {
    def kindSlice(kind: String) =
      ranked.filter(e => e._1 == kind && e._3 <= k).sortBy(_._3).map(_._2)
    (kindSlice("w") ++ kindSlice("3") ++ kindSlice("2")).distinct
  }

  /** Learn a subword vocabulary from the corpus: the `topWords` most frequent
    * whole words plus the `topGrams` most frequent character 3-grams and
    * 2-grams (occurrence-weighted), ties broken by string ascending — the
    * deterministic rank both engines reproduce. Single-char fallback is
    * implicit in the matcher, so chars are not part of the vocabulary.
    * One [[subwordVocabRanked]] job (literal rank limit — keeps
    * InferWindowGroupLimit applicable) sliced per kind on the driver.
    */
  def subwordVocab(df: DataFrame, textCol: String, topWords: Int, topGrams: Int): Seq[String] = {
    val ranked = subwordVocabRanked(df, textCol, math.max(topWords, topGrams))
    def slice(kind: String, k: Int) =
      ranked.filter(e => e._1 == kind && e._3 <= k).sortBy(_._3).map(_._2)
    (slice("w", topWords) ++ slice("3", topGrams) ++ slice("2", topGrams)).distinct
  }

  /** Token-balanced serpentine shard packing report: docs ranked by token
    * count (desc, `idCol` tiebreak) snake across `nShards` shards (rank row
    * r → shard r%n on even passes, n-1-r%n on odd — the standard
    * near-balanced deterministic assignment for equal-token training
    * shards), rolled up per shard with a balance ratio vs the even split.
    *
    * The global rank is DISTRIBUTED: per-token-count row_number (bounded
    * groups) + a cumulative-offset window over the DISTINCT token counts (a
    * few hundred rows at any corpus size — the pack_sequences carry-table
    * pattern) broadcast back; no single-task corpus sort anywhere. Shared by
    * the gated query and the scale probe so the rank/snake formula cannot
    * diverge between them.
    */
  def tokenShardReport(df: DataFrame, textCol: String, idCol: String,
      nShards: Int): DataFrame = {
    val t = df.select(col(idCol),
      wsTokens(col(textCol)).cast(LongType).as("toks"))
    val wIn = Window.partitionBy("toks").orderBy(idCol)
    val wOff = Window.orderBy(col("toks").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = t.groupBy("toks").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .select("toks", "off")
    t.withColumn("rn", row_number().over(wIn).cast(LongType))
      .join(broadcast(offs), "toks")
      .withColumn("rk", col("off") + col("rn") - 1)
      .withColumn("shard", when(expr(s"rk DIV $nShards") % 2 === 0, col("rk") % nShards)
        .otherwise(lit(nShards - 1L) - col("rk") % nShards))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
      .withColumn("balance_ratio", round(
        col("total_tokens").cast(DoubleType) * nShards /
          sum("total_tokens").over(Window.partitionBy()), 6))
      .orderBy("shard")
  }

  /** Corpus segmentation report under greedy longest-match encoding with
    * `vocab`: per `groupCol`, document/word/token/fallback/char totals plus
    * the two tokenizer-quality ratios (fallback rate, chars per token) a
    * vocab designer reads before committing to a tokenizer. The whole encode
    * is one narrow codegen'd pass ([[graft.expressions.GreedySegment]]); the
    * only wide stage is the final tiny per-group rollup.
    */
  def subwordEncodeReport(df: DataFrame, textCol: String, groupCol: String,
      vocab: Seq[String]): DataFrame = {
    import graft.expressions.{GraftFunctions => G}
    // ONE doc-level kernel call per row ([n_words, n_tokens, n_fallback,
    // n_chars]); the token array appears in exactly one expression, so the
    // tokenize regexp runs once per row (the per-word transform/aggregate
    // formulation paid interpreted lambda dispatch per word and re-inlined
    // the regexp 3× via CollapseProject)
    df.select(col(groupCol),
        G.subwordStats(Dedup.tokens(col(textCol)), vocab).as("st"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(element_at(col("st"), 1)).as("n_words"),
        sum(element_at(col("st"), 2)).as("n_tokens"),
        sum(element_at(col("st"), 3)).as("n_fallback"),
        sum(element_at(col("st"), 4)).as("n_chars"))
      .withColumn("fallback_rate",
        when(col("n_tokens") > 0,
          round(col("n_fallback").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)))
      .withColumn("chars_per_token",
        when(col("n_tokens") > 0,
          round(col("n_chars").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)))
      .orderBy(groupCol)
  }
}
