package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Large-scale corpus deduplication: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Everything is expressed with codegen'd built-ins (higher-order array
  * functions, xxhash64) — no UDFs — so whole-stage codegen spans the hot path
  * and all shuffles are explicit groupBy/join keys.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup: one hash aggregation on the content hash (map-side partial);
  *    shuffle carries one row per distinct hash, not per input row.
  *  - MinHash/LSH: per-row signature computation is narrow; the only shuffle is
  *    the band-bucket self-join, whose fan-out is controlled by band width.
  *    Mega-buckets (boilerplate shingles) are exploded only per-band.
  *  - candidate verification joins back on doc_id — sort-merge on a long key.
  */
object Dedup {

  /** Word n-gram shingles of a text column, lowercased, punctuation-stripped.
    * `sequence`+`transform` keeps this inside codegen (no explode needed until
    * the caller wants one row per shingle).
    */
  def shingles(text: Column, n: Int): Column = {
    val words = split(regexp_replace(lower(text), "[^\\p{L}\\p{Nd}]+", " "), " ")
    val clean = filter(words, w => length(w) > 0)
    val k = size(clean) - (n - 1)
    when(k <= 0, array(array_join(clean, " ")))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => array_join(slice(clean, i + 1, lit(n)), " ")))
  }

  /** Exact deduplication: keep one representative row (min id) per distinct
    * content hash. groupBy on a 64-bit hash instead of the raw text keeps the
    * shuffle narrow (8 bytes vs document bytes).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("__h", xxhash64(col(textCol)))
    val keep = hashed.groupBy(col("__h")).agg(min(col(idCol)).as(idCol)).drop("__h")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signatures via explode + hash aggregation — the scale path.
    *
    * One row per (doc, distinct shingle); the shingle is hashed ONCE
    * (`xxhash64(shingle)`) and lane i re-mixes the 8-byte hash
    * (`xxhash64(h, i)`), so the string is never re-tokenized or re-hashed per
    * lane. The k lanes are k plain `min()` aggregates — fully codegen'd
    * hash aggregation with map-side partials, no lambda interpretation
    * anywhere. (The naive `transform(sequence…)` formulation is a trap:
    * higher-order lambdas don't codegen, and CollapseProject re-inlines the
    * shingle expression into every lane — k× interpreted tokenization.)
    *
    * Returns (id, sig ARRAY<BIGINT>[k]).
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, k: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val lanes = (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"__m$i"))
    exploded.groupBy(col("id")).agg(lanes.head, lanes.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Single-row convenience variant of the MinHash lane definition (tests):
    * lane i = min over shingles of `xxhash64(xxhash64(shingle), i)` — the same
    * family as [[minhashSignatures]].
    */
  def minhashSignature(text: Column, shingleN: Int, k: Int): Column = {
    val hs = transform(array_distinct(shingles(text, shingleN)), s => xxhash64(s))
    array((0 until k).map(i => array_min(transform(hs, h => xxhash64(h, lit(i))))): _*)
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Signatures are banded (`bands` bands of `rowsPerBand` hashes); documents
    * sharing any band bucket become candidates (one exploded row per band —
    * fan-out k/rowsPerBand per doc, not per shingle); candidates are verified
    * by estimated Jaccard = matching signature positions / k.
    *
    * Returns (idA, idB, est_jaccard) with idA < idB.
    */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPerBand = k / bands
    val sigs = minhashSignatures(df, textCol, idCol, shingleN, k).persist()
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))))
      .select(col("id"), col("sig"), col("col.band"), col("col.bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
          .cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash fingerprints via explode + hash aggregation — the scale path
    * (same design rationale as [[minhashSignatures]]).
    *
    * One row per (doc, distinct shingle) with the shingle hashed once; bit j's
    * vote is a plain `sum(±1 by bit j)` aggregate — 64 codegen'd sums with
    * map-side partials — and the fingerprint packs the vote signs in one
    * post-aggregation projection.
    *
    * Returns the id column plus (outCol LONG).
    */
  def simhashFingerprints(df: DataFrame, textCol: String, idCol: String,
      outCol: String, shingleN: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"__v$j"))
    val packed = (0 until 64).map(j =>
      when(col(s"__v$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)).reduce(_ + _)
    exploded.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as(outCol))
  }

  /** SimHash over a frame keeping all input columns: fingerprints are
    * aggregated id-keyed ([[simhashFingerprints]]) and joined back, so the
    * document payload never rides through the aggregation shuffle — only
    * (id, shingle-hash) rows do.
    */
  def withSimhash(df: DataFrame, textCol: String, idCol: String, outCol: String,
      shingleN: Int = 2): DataFrame = {
    val fps = simhashFingerprints(df, textCol, idCol, outCol, shingleN)
      .withColumnRenamed("id", idCol)
    df.join(fps, Seq(idCol))
  }

  /** Single-row convenience variant of the SimHash bit definition (tests) —
    * same hash family as [[simhashFingerprints]].
    */
  def simhash(text: Column, shingleN: Int = 2): Column = {
    val hs = transform(array_distinct(shingles(text, shingleN)), s => xxhash64(s))
    val votes = (0 until 64).map(j =>
      aggregate(hs, lit(0), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    votes.zipWithIndex.map { case (v, j) =>
      when(v > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle index:
    * explode distinct shingles, self-join on shingle (co-occurrence count =
    * |A∩B|), combine with per-doc set sizes for |A∪B|.
    *
    * Shuffles: one explode+groupBy on (shingle hash) and one pair aggregation —
    * both partial-aggregable. Hot shingles (stopword n-grams) are the skew
    * risk; `maxDocFreq` drops shingles occurring in more than that many docs
    * (standard inverted-index stopword pruning — at worst it lowers recall for
    * boilerplate-only overlap).
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Long = 1000L): DataFrame = {
    val docShingles = df.select(col(idCol).as("id"),
      explode(array_distinct(shingles(col(textCol), n))).as("sh"))
      .withColumn("sh", xxhash64(col("sh")))
      .persist() // referenced 4× below; one tokenization pass instead of four
    val sizes = docShingles.groupBy("id").agg(count(lit(1)).as("sz"))
    val pruned = docShingles.join(
      docShingles.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq),
      Seq("sh"), "left_semi")
      // size rides on every posting so the size-ratio bound prunes at the join
      .join(sizes, Seq("id"))
    // Size-ratio prefilter (set-similarity joins, e.g. Xiao et al. PPJoin):
    // J(A,B) >= t  ⟹  t·|A| <= |B| <= |A|/t. Purely a pruning bound — every
    // surviving pair is still exactly verified — but it cuts the candidate
    // aggregation's shuffle before it happens.
    val l = pruned.select(col("sh"), col("id").as("id_a"), col("sz").as("sz_a"))
    val r = pruned.select(col("sh"), col("id").as("id_b"), col("sz").as("sz_b"))
    val inter = l.join(r, Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_b") >= col("sz_a") * threshold &&
        col("sz_a") >= col("sz_b") * threshold)
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs over an `Array[Float]` column,
    * LSH-bucketed by random-hyperplane signs so the self-join is per-bucket
    * instead of all-pairs. See [[Similarity.cosine]] for the exact kernel.
    */
  def embeddingPairs(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.hyperplaneSignature(col("v"), planes))
    val pairs = bucketed.as("a").join(bucketed.as("b"), Seq("bucket"))
      .filter(col("a.id") < col("b.id"))
    pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
