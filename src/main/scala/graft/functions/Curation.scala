package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * benchmark decontamination, repetition scoring, sequence packing, and
  * deterministic weighted sampling.
  *
  * Everything here is engine-portable arithmetic (integer folds, IEEE-exact
  * double ops) over codegen'd column expressions — no UDFs — so the full
  * pipeline stays inside whole-stage codegen AND the DuckDB oracle can
  * certify results bit-for-bit (same discipline as [[TextFunctions]]).
  */
object Curation {

  /** Train-vs-benchmark n-gram overlap (decontamination): documents of
    * `train` that share at least `minOverlap` DISTINCT word k-grams with
    * any document of `eval` — the standard train/test contamination sweep
    * run before every model training job.
    *
    * Returns (idCol, n_shared) for flagged documents.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus (eval
    * suites are thousands of documents; the corpus is billions), so its
    * distinct gram set is collected into a broadcast hash join — the sweep
    * over 100 TB of train text is ONE map-side join + one partial/final
    * count-distinct aggregation, no all-to-all shuffle of the corpus. */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String,
                    k: Int = 3, minOverlap: Long = 3L): DataFrame = {
    graft.GraftFunctions.register(train.sparkSession)
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(array_distinct(call_function("word_ngrams",
          TextFunctions.tokens(col(textCol)), lit(k)))).as("gram"))
    val evalGrams = grams(eval).select(col("gram")).distinct()
    grams(train)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /** Polynomial string hash h = fold((acc·base + codepoint) mod 2^31−1)
    * — the portable family ([[TextFunctions.rollingHash]] rationale):
    * pure integer arithmetic both engines reproduce bit-for-bit. */
  private def polyHash(s: Column, base: Long): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => (acc * lit(base) + ascii(c)) % lit(2147483647L))

  /** BLOOM-GATED decontamination — the bounded-memory form of
    * [[decontaminate]] for when the held-out suite is NOT small: the exact
    * sweep broadcasts the benchmark's full distinct-gram set (unbounded —
    * a large eval suite is GBs of grams), while this pass compresses it
    * into an `mBits`-bit Bloom filter (two portable polynomial hashes per
    * gram) that stays a few KB NO MATTER how large the benchmark grows.
    * The probe is then a pure MAP over the corpus: per document, count
    * distinct grams whose two bits are both set — no join at all, the
    * whole probe inside whole-stage codegen.
    *
    * Returns (idCol, n_hits) for documents with at least `minOverlap`
    * gram hits. Flags a deterministic SUPERSET of the exact sweep: Bloom
    * false positives (rate ≈ (1−e^{−2n/m})² for n grams in m bits) can
    * only ADD hits, never lose one — the safe direction for
    * decontamination; chase with [[decontaminate]] on the flagged slice
    * when exactness matters. Both hash functions are the portable
    * polynomial family, so the filter — including its false positives —
    * is reproduced bit-for-bit by the DuckDB oracle. */
  def decontaminateBloom(train: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 3, minOverlap: Long = 3L,
                         mBits: Int = 1 << 16): DataFrame = {
    graft.GraftFunctions.register(train.sparkSession)
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    val gramsCol: Column =
      array_distinct(call_function("word_ngrams",
        TextFunctions.tokens(col(textCol)), lit(k)))
    def bitPos(g: Column, base: Long): Column = polyHash(g, base) % lit(mBits.toLong)
    // build: benchmark grams -> 2 bit positions each -> OR into m/64 words.
    // The aggregated word table is at most mBits/64 rows (8 KiB at the
    // default) — THAT is the collect bound, independent of benchmark size.
    val positions = eval.select(explode(gramsCol).as("gram"))
      .distinct()
      .select(explode(array(bitPos(col("gram"), 131L), bitPos(col("gram"), 137L))).as("p"))
      .select(shiftright(col("p"), 6).as("w"),
        call_function("shiftleft", lit(1L), col("p").bitwiseAND(lit(63L)).cast("int")).as("b"))
      .groupBy(col("w")).agg(call_function("bit_or", col("b")).as("bits"))
    val words = new Array[Long](mBits / 64)
    positions.collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val bloom = typedlit(words.toSeq)
    // probe: map-only — count a document's distinct grams with both bits
    // set, via the native bloom_hits kernel (one codegen'd JVM loop per
    // document; an aggregate() HOF here re-evaluates two interpreted
    // polyHash lambdas per gram and measured ~4× slower than the exact
    // sweep — the tokenWindows lesson, round 5)
    train
      .select(col(idCol),
        call_function("bloom_hits", gramsCol, bloom).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
  }

  /** Fasttext-style learned quality scoring — MODEL APPLY, the standard
    * learned quality filter in training-data pipelines (a linear model
    * over hashed bag-of-ngram features; training happens offline, the
    * engine's job is applying it at corpus scale). Features are unigrams
    * + bigrams hashed into `weights.size` buckets with the portable
    * polynomial hash; score = bias + Σ weights[bucket] / |features| —
    * length-normalized so long documents don't dominate.
    *
    * Scale shape: the model is a broadcast literal (KBs), the pass is
    * map-only inside whole-stage codegen via the native `weight_sum`
    * kernel — 100 TB costs one scan, no shuffle. Engine-portable: the
    * left-to-right IEEE fold is reproduced bit-for-bit by the DuckDB
    * oracle. */
  def classifyLinear(df: DataFrame, textCol: String,
                     weights: Seq[Double], bias: Double = 0.0): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    require(weights.nonEmpty, "classifyLinear: empty weight table")
    val toks = TextFunctions.tokens(col(textCol))
    val bigrams = call_function("word_ngrams", toks, lit(2))
    val w = typedlit(weights)
    df.withColumn("quality_score",
      lit(bias) +
        (call_function("weight_sum", toks, w) +
         call_function("weight_sum", bigrams, w)) /
        (size(toks) + size(bigrams)).cast("double"))
  }

  /** Intra-document repetition ratio in [0,1]: 1 − |distinct tokens| /
    * |tokens| (0 = every token unique, →1 = heavy repetition). The
    * Gopher-style repetition quality gate, as a map-only column
    * expression: IEEE-exact division, engine-portable. */
  def repetitionRatio(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    lit(1.0) - size(array_distinct(toks)).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  /** Greedy in-order sequence packing: assign each document a bin id such
    * that consecutive documents (ordered by `orderCol` within a
    * `partCols` group) accumulate into bins of ~`targetTokens` tokens —
    * the standard pretraining sequence-packing pass (documents
    * concatenated into fixed-token training windows).
    *
    * bin = floor(tokens-before-this-doc / targetTokens), so a document
    * starts a new bin once the running total crosses the target; bins can
    * overflow by at most one document (greedy packing never splits).
    *
    * Returns the input plus (n_tok, bin).
    *
    * Scale shape: ONE window aggregation partitioned by `partCols` — each
    * group sorts locally after a hash shuffle, no global sort. Callers
    * choose `partCols` granularity (e.g. lang × source × shard) so groups
    * fit an executor; packing quality only needs in-group order. */
  def packSequences(df: DataFrame, textCol: String, orderCol: String,
                    partCols: Seq[String], targetTokens: Long): DataFrame = {
    // explicit ROWS frame: the default RANGE frame would sum order-key
    // PEERS together, silently mis-binning under a non-unique orderCol
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", TextFunctions.tokenCount(col(textCol)))
      .withColumn("bin",
        floor(((sum(col("n_tok")).over(w) - col("n_tok")).cast("double")) /
          lit(targetTokens.toDouble)).cast("long"))
  }

  /** Document chunking: split each document into fixed-token windows with
    * overlap — the pass that feeds embedding generation / retrieval
    * indexing (documents are too long to embed whole; consecutive chunks
    * share `overlap` tokens so no boundary context is lost).
    *
    * Chunk starts are 0, stride, 2·stride, … (stride = chunkTokens −
    * overlap) while start < token count; the last chunk may be short.
    * Returns one row per chunk: input columns + (chunk_idx, chunk_text,
    * chunk_tokens). Map-only: sequence + explode + slice, no shuffle —
    * the 100 TB shape is a pure flatMap that scales with output size. */
  def chunkDocuments(df: DataFrame, textCol: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    df.withColumn("__n", size(toks))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          floor(greatest(col("__n") - 1, lit(0)).cast("double") / lit(stride.toDouble)).cast("int"),
          lit(1))))
      .withColumn("__start", col("chunk_idx") * lit(stride))
      .filter(col("__start") < col("__n"))
      .withColumn("chunk_text",
        array_join(slice(toks, col("__start") + 1, lit(chunkTokens)), " "))
      .withColumn("chunk_tokens",
        least(col("__n") - col("__start"), lit(chunkTokens)))
      .drop("__n", "__start")
  }

  /** Line-level deduplication (the C4 / RefinedWeb pass): drop every
    * SEGMENT that occurs in at least `minDf` distinct documents, keeping
    * each document's remaining segments in their original order. On web
    * corpora the segment is the newline-delimited line (navigation bars,
    * cookie banners, license footers repeat across millions of pages);
    * `segsCol` is caller-supplied so the same operator runs on sentences
    * or fixed token windows (duplicated-passage removal) when the corpus
    * has no line structure.
    *
    * A document's internal repeats do not inflate df — frequency is
    * counted over DISTINCT (document, segment) pairs, as the pipelines
    * define it.
    *
    * Returns (id, text_clean, n_total, n_kept); documents that lose every
    * segment survive with `text_clean = ""` and `n_kept = 0`.
    *
    * Scale shape: unlike [[decontaminate]]'s benchmark set, the frequent-
    * segment set is corpus-sized (bounded only by |corpus|/minDf), so it
    * is NOT broadcast: df counting is one partial/final count aggregate
    * on the segment key, removal is a shuffled LEFT ANTI join on the same
    * key (AQE reuses the exchange), and reassembly is one groupBy on the
    * document id — every stage's shuffle is bounded by the posting list,
    * nothing ever materializes on the driver. A hot segment (df in the
    * millions) collapses to ONE row in the frequent side before the anti
    * join, so posting skew never amplifies. */
  def lineDedup(df: DataFrame, idCol: String, segsCol: Column,
                minDf: Long = 2L, sep: String = " "): DataFrame = {
    // spread before the window-segmentation kernel: BOTH consumers (the
    // df-count pass and the posting/reassembly pass) evaluate segsCol per
    // row, and on a single-split corpus scan each ran on one core; the
    // one exchange (id + input columns) is reused by both sides
    val wdf = Spread.byKey(df, col(idCol))
    val base = wdf.select(col(idCol).as("id"), segsCol.as("segs"))
    val frequent = segmentDf(wdf, idCol, segsCol)
      .filter(col("seg_df") >= minDf).select(col("seg"))
    cleanAgainst(base, frequent, sep)
  }

  /** The SUM-mergeable per-segment state behind [[lineDedup]]: how many
    * DISTINCT documents contain each segment. This is the table a
    * long-running pipeline persists between crawls — counts from disjoint
    * document batches simply add. */
  def segmentDf(df: DataFrame, idCol: String, segsCol: Column): DataFrame =
    df.select(col(idCol).as("id"), explode(array_distinct(segsCol)).as("seg"))
      .groupBy(col("seg")).agg(count(lit(1)).as("seg_df"))

  /** Anti-join `base` (id, segs) against the frequent-segment set and
    * reassemble survivors in order — the removal half of [[lineDedup]]. */
  private def cleanAgainst(base: DataFrame, frequent: DataFrame,
                           sep: String): DataFrame = {
    val posted = base.select(col("id"), posexplode(col("segs")).as(Seq("pos", "seg")))
    val kept = posted.join(frequent, Seq("seg"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
             array_sort(collect_list(struct(col("pos"), col("seg")))),
             s => s("seg")), sep).as("text_clean"),
           count(lit(1)).as("n_kept"))
    base.select(col("id"), size(col("segs")).cast("long").as("n_total"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_total"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** The incremental outputs of [[lineDedupIncremental]]: the new batch
    * cleaned against the POST-merge segment frequencies, the updated df
    * state to persist, and the segments the batch pushed over the
    * threshold — the invalidation set a downstream job consumes to
    * re-clean the old documents that contain them. */
  final case class LineDedupDelta(cleaned: DataFrame, mergedDf: DataFrame,
                                  newlyFrequent: DataFrame)

  /** Nightly-crawl line dedup: fold a new document batch into an existing
    * [[segmentDf]] state and clean ONLY the new batch. Cost is
    * O(new + state merge) — the corpus is never re-read; a re-run of the
    * full pipeline and this increment agree exactly (spec-pinned),
    * because df counts over disjoint batches are additive. */
  def lineDedupIncremental(newDocs: DataFrame, idCol: String, segsCol: Column,
                           existingDf: DataFrame, minDf: Long = 2L,
                           sep: String = " "): LineDedupDelta = {
    val state = existingDf.select(col("seg"), col("seg_df"))
    val merged = state.unionByName(segmentDf(newDocs, idCol, segsCol))
      .groupBy(col("seg")).agg(sum(col("seg_df")).as("seg_df"))
    val frequent = merged.filter(col("seg_df") >= minDf).select(col("seg"))
    val base = newDocs.select(col(idCol).as("id"), segsCol.as("segs"))
    val newlyFrequent = frequent.join(
      state.filter(col("seg_df") >= minDf).select(col("seg")), Seq("seg"), "left_anti")
    LineDedupDelta(cleanAgainst(base, frequent, sep), merged, newlyFrequent)
  }

  /** Non-overlapping `w`-token window segmentation of `textCol` — the
    * segmenter [[lineDedup]] runs with on corpora that have no newline
    * structure (duplicated-passage removal). The tail window keeps its
    * partial length.
    *
    * One greedy regex pass per row (leftmost match eats `w` tokens, the
    * tail match takes what remains) instead of a higher-order
    * transform-of-slices — the lambda form re-ran the tokenizer per
    * window and fell out of codegen, and the segmentation sits under
    * every branch of the dedup DAG, so its per-row cost multiplies. */
  def tokenWindows(textCol: Column, w: Int): Column = {
    require(w >= 1, s"window must be >= 1 token: $w")
    val norm = regexp_replace(trim(textCol), "\\s+", " ")
    val pat = "\\S+" + s"( \\S+){0,${w - 1}}"
    when(length(norm) === 0, array(lit("")))
      .otherwise(regexp_extract_all(norm, lit(pat), lit(0)))
  }

  /** Per-category token-budget quota: keep each category's documents in
    * deterministic hash-priority order until the category's cumulative
    * token count reaches `budgetTokens` — the "cap each domain's
    * contribution" pass of a data recipe (rate sampling bounds the
    * FRACTION kept; this bounds the TOKENS kept, whatever the domain's
    * size). Priority is the portable digit-fold hash of the id (ties to
    * the id), so the kept set is a stable pseudo-random sample that only
    * shrinks as a domain grows past its budget.
    *
    * Returns the input plus (n_tok, priority, cum_tok), filtered to the
    * kept rows. One window sum per category after a hash shuffle — same
    * scale shape as [[packSequences]]. */
  def quotaCap(df: DataFrame, idCol: String, categoryCol: String,
               textCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(categoryCol))
      .orderBy(col("priority"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", TextFunctions.tokenCount(col(textCol)))
      .withColumn("priority", TextFunctions.rollingHash(col(idCol).cast("string")))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetTokens)
  }

  /** Unigram-frequency fluency score: each document's mean corpus
    * relative frequency over its token occurrences — the cheap
    * perplexity proxy (gibberish and boilerplate both sit far from the
    * corpus unigram distribution; log-free so the arithmetic is
    * engine-exact). Returns (idCol, score).
    *
    * Scale shape: one vocabulary aggregation (partial+final, bounded by
    * |vocab|), broadcast back over the exploded token stream, one
    * per-document aggregation. The broadcast assumes a closed-ish
    * vocabulary (true of whitespace unigrams); for open vocabularies
    * drop the broadcast hint and let the planner shuffle-join on the
    * token. Accumulation uses the decimal pattern
    * (graft.queries.dsum rationale) so scores are order-independent and
    * bit-identical across engines. */
  def unigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks
      .join(broadcast(counts), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg((sum((col("cnt").cast("double") / col("n_total").cast("double"))
        .cast("decimal(27,18)")).cast("double") /
        count(lit(1)).cast("double")).as("score"))
  }

  /** Deterministic per-category weighted sampling: keep a row iff
    * H(id) mod 1000 < rate‰ for its category — the domain-mixing /
    * up-down-sampling pass of a pretraining data recipe. H is the
    * portable Rabin–Karp fold over the id's decimal digits
    * ([[TextFunctions.rollingHash]]), so the kept set is reproducible
    * across engines and runs — re-running the pipeline on a grown corpus
    * keeps exactly the previously-kept rows (no RNG, no seed state).
    *
    * `ratesPermille`: category → keep-rate in ‰; `defaultPermille`
    * applies to unlisted categories. Map-only: filter + no shuffle. */
  def sampleWeighted(df: DataFrame, idCol: String, categoryCol: String,
                     ratesPermille: Map[String, Int],
                     defaultPermille: Int): DataFrame = {
    val rate = ratesPermille.toSeq.sortBy(_._1).foldRight(
      lit(defaultPermille): Column) { case ((cat, r), acc) =>
      when(col(categoryCol) === cat, lit(r)).otherwise(acc)
    }
    val h = TextFunctions.rollingHash(col(idCol).cast("string")) % 1000L
    df.filter(h < rate.cast("long"))
  }

  /** URL canonicalization — the first dedup key of every crawl pipeline
    * (the same page arrives as `HTTP://Host:80/a/?utm_source=x&b=1#frag`
    * and `http://host/a?b=1`). Normalizations, each a pure column
    * expression (map-only, codegen'd, reproducible in any engine):
    * scheme and host lowercase; default port stripped (`:80` for http,
    * `:443` for https); fragment dropped; query parameters sorted with
    * `utm_*` tracking parameters removed; trailing path slashes
    * stripped (bare host becomes `/`). Not touched (correctness over
    * zeal): percent-encoding, param VALUES, non-default ports. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z]+://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val stripped = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val q = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(q, "&"),
      p => p =!= "" && !(substring(p, 1, 4) === "utm_"))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }
}
