"""Corpus-statistics operators for tokenizer building and relevance
scoring — the counting side of a training-data pipeline (vocabulary
construction, BPE merge statistics, TF-IDF keywords, boilerplate
detection).

Everything is built-in-expression composition (codegen'd, no Python in
the hot path), and every aggregation is partial-aggregated (map-side
combine) before its one shuffle:

* ``tfidf_topk`` — per-document top-k terms by TF-IDF: the classic
  keyword-extraction / relevance primitive.
* ``build_vocab`` — frequency-ranked vocabulary with cumulative
  coverage: the first step of training any tokenizer.  The global
  ranking uses ``orderBy().limit()`` — Spark's distributed TakeOrdered,
  never a single-partition sort of the full term table; only the
  ``vocab_size`` survivors see the (tiny) ranking window.
* ``bpe_pair_counts`` — adjacent-token-pair frequencies: one iteration
  of the BPE merge-statistics loop, the inner counting kernel of
  tokenizer training, fanned out inside codegen (``transform`` over an
  index ``sequence``, no UDF).
* ``boilerplate_score`` — per-document fraction of k-gram shingles that
  are corpus-hot (document frequency above a threshold): the
  boilerplate/template-contamination quality signal (RefinedWeb/CCNet
  lineage).  The hot-shingle set is small by construction (only
  shingles repeated across > ``hot_df`` documents) and broadcasts, so
  the corpus side never shuffles on the shingle for the scoring join.

100 TB notes: term/pair tables are vocabulary-sized (≪ corpus-sized)
after their partial-aggregated groupBys; the only corpus-sized shuffle
in the family is TF-IDF's (doc, term) aggregation, which is the
irreducible shape of the statistic.  Skew: ``boilerplate_score``'s
shingle-df aggregation sees hot keys, but hot keys are exactly what
partial aggregation collapses map-side — each task emits one row per
(shingle) before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.functions.textan import shingles, tokens
from res2df_spark.session import truncate_lineage


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) long form — term frequency per document."""
    return (
        docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF (``tf · ln(N/df)``).

    Plan shape: one (doc, term) partial-aggregated groupBy for tf, one
    term-level groupBy for df (vocabulary-sized output, skew-immune —
    see the in-body note on why df is NOT a window), the tf⋈df join on
    the term key, and a per-document ranking window.  The document
    count ``N`` rides along as a broadcast single-row cross join — no
    driver-side ``.count()`` in the plan.  Ranking happens on the
    score ROUNDED to 6 dp with ties broken by term: ``ln`` is only
    1-ulp-reproducible across math libraries (JVM vs libm disagree on
    e.g. ln(9) in the last bit, observed via hypothesis), so ranking
    unrounded doubles would flip exact-tie ranks between engines —
    rounded-score ranking makes the result a pure function of the
    corpus on any engine.

    Reference analogue: the reference engine has no IR scoring; this is
    north-star scope (training-data curation needs per-doc keywords for
    topic mixing audits).
    """
    tf = _doc_terms(docs, id_col, text_col)
    # N counts documents that CONTRIBUTE terms — NULL-text/zero-token
    # rows have no postings, and counting them into N would inflate
    # every idf (a term in every real document must get idf 0)
    #
    # Round 12: the df and N branches each re-executed the whole
    # scan→tokenize→explode→aggregate tf lineage (3 corpus passes for
    # one statistic) because column pruning dropped the unused ``tf``
    # count from their child aggregates, making the children
    # canonically different from the join-side tf — so ReuseExchange
    # never fired.  Both branches now REFERENCE ``tf`` through an
    # always-true predicate (count per group is ≥ 1 by construction):
    # semantically identical, but the child plans become byte-equal and
    # both branches ride the ONE (doc, term) exchange — scans 3 → 1,
    # plan-pinned by tests/test_r12_optim.py.
    n_docs = tf.filter(F.col("tf") >= 1).select(
        F.count_distinct(F.col(id_col)).alias("__n")
    )
    # df stays a partial-aggregated groupBy + join-back, DELIBERATELY
    # (round 11, measured then reverted): a window count over the
    # unigram term key would save the second pass (-20 % at sf0.1) but
    # concentrates a stop-word's ENTIRE postings in one window task —
    # 'the' appears in ~every document, so that task is O(|corpus|)
    # with no partial aggregation and no AQE split (AQE cannot split
    # window partitions).  The groupBy is DISTRIBUTED and
    # map-side-combined — and after the round-12 reuse fix above its
    # input is the reused tf exchange, not a re-scan, so the skew
    # posture costs no extra corpus pass anymore.  (The shingle-keyed
    # windows elsewhere in this codebase are different: k-word shingles
    # dilute hot-key mass, and the cap windows DISCARD the hot keys
    # they count.)
    df = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df")
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def build_vocab(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency-ranked vocabulary: the ``vocab_size`` most frequent
    terms with rank and cumulative corpus coverage.

    The term-count table is vocabulary-sized after one
    partial-aggregated groupBy; the top-``vocab_size`` cut is
    ``orderBy().limit()`` — Spark plans TakeOrderedAndProject, a
    per-partition top-k merged on one reducer, NOT a global sort.  Only
    the survivors (≤ ``vocab_size`` rows) pass through the cumulative
    window, so the single-partition window cost is bounded by the
    vocabulary budget, not the corpus.  Ties break by term for
    engine-stable ranking; ``cum_coverage`` is the fraction of all
    token occurrences the vocabulary prefix up to this rank explains —
    the curve a tokenizer budget is tuned against.
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.select(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(vocab_size)
    w = Window.orderBy(F.col("n").desc(), F.col("term")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.crossJoin(broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("term")))
            .cast("int")
            .alias("rank"),
            "term",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.sum("n").over(w) / F.col("__total"), 6
            ).alias("cum_coverage"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-token-pair frequencies — one iteration of the BPE
    merge-statistics loop (the most frequent pair is the next merge).

    The pair fan-out happens inside whole-stage codegen: a ``transform``
    over an index ``sequence`` zips each token with its successor — no
    UDF, no self-join on position.  One partial-aggregated groupBy on
    the pair, then the distributed TakeOrdered cut; ties break by
    (left, right) so the top-``top_k`` boundary is deterministic on any
    engine.
    """
    # bind the token array first — captured inside the transform
    # lambda, the raw tokens() expression would re-tokenize the
    # document per pair element (~2(n-1) times per doc)
    base = docs.filter(F.size(tokens(text_col)) >= 2).withColumn(
        "__toks", tokens(text_col)
    )
    toks = F.col("__toks")
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at(toks, i).alias("left"),
            F.element_at(toks, i + 1).alias("right"),
        ),
    )
    return (
        base.select(F.explode(pairs).alias("p"))
        .select(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
        .limit(top_k)
    )


def boilerplate_score(
    docs: DataFrame,
    shingle_k: int = 3,
    hot_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's
    distinct ``shingle_k``-gram shingles whose corpus document
    frequency exceeds ``hot_df`` — template/navigation text repeated
    across many documents (the RefinedWeb/CCNet boilerplate signal; a
    quality gate thresholds on it, a remover targets the hot shingles).

    Scale shape: shingle document frequency is one partial-aggregated
    groupBy (hot keys collapse map-side); the hot set — shingles with
    df > ``hot_df`` — is small by construction and BROADCASTS back onto
    the per-document shingles, so the scoring join never shuffles the
    corpus on the shingle key.  Documents shorter than ``shingle_k``
    tokens yield no row (they have no shingles to score).
    """
    sh = (
        docs.withColumn("__toks", tokens(text_col))
        .select(
            F.col(id_col),
            F.explode(shingles(F.col("__toks"), shingle_k)).alias("shingle"),
        )
        .distinct()
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") > hot_df)
        .select("shingle")
        .withColumn("__hot", F.lit(1))
    )
    return (
        sh.join(broadcast(hot), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hot"), F.lit(0)).cast("long").alias("n_hot"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hot",
            F.round(F.col("n_hot") / F.col("n_shingles"), 6).alias(
                "boilerplate_frac"
            ),
        )
    )


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with corpus frequencies — BPE training state.

    This is THE scale trick of distributed BPE: all merge work happens
    on the vocabulary-sized word table (unique words × frequency), so a
    100 TB corpus collapses to ~millions of rows after one
    partial-aggregated groupBy, and every training iteration touches
    only that table."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars_with_eow(word, end_of_word: str):
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(end_of_word)))


def _adjacent_pairs(syms):
    # guard single-symbol words: sequence(1, 0) DESCENDS in Spark, so an
    # unguarded transform would index past the array end
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left"),
            F.element_at(syms, i + 1).alias("right"),
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(
        F.array().cast("array<struct<left:string,right:string>>")
    )


def _merge_pair(syms, left: str, right: str):
    """Leftmost-greedy merge of every adjacent (left, right) in a symbol
    array — a single fold: when the accumulator's last symbol is
    ``left`` and the next is ``right``, replace the last with the
    concatenation, else append."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    end_of_word: str = "</w>",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016),
    distributed: returns the ordered merge list and the final
    (word, freq, syms) table.

    Each iteration: frequency-weighted adjacent-pair counts over the
    word table (one partial-aggregated shuffle on the pair), the
    arg-max pair pulled to the driver (a 1-row TakeOrdered — ties break
    by (left, right) so training is deterministic on any engine /
    partitioning), then a leftmost-greedy in-array merge applied
    map-side.  ``session.truncate_lineage`` truncates the lineage per
    iteration, the same guard as ``kmeans_fit`` (reliable
    ``checkpoint()`` when ``spark.res2df.checkpointDir`` is set).
    Training stops early when the best pair drops below
    ``min_pair_count``.

    Scale: iterations cost O(|vocab|) each, independent of corpus size
    (see ``_word_table``); the driver only ever holds the merge list.
    """
    words = _word_table(docs, text_col).withColumn(
        "syms", _chars_with_eow(F.col("word"), end_of_word)
    )
    words = truncate_lineage(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            words.select(F.col("freq"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        words = truncate_lineage(
            words.withColumn("syms", _merge_pair(F.col("syms"), left, right))
        )
    return merges, words


def bpe_segment(
    docs: DataFrame,
    words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Segment documents with a trained BPE table: explode to (doc,
    position, word), look the word up in the trained (word, syms) table
    and fall back to character-split (the untrained-word contract) for
    out-of-vocabulary words.  Returns (id, n_words, n_pieces).

    The trained table is vocabulary-sized → broadcast; the corpus side
    never shuffles for the lookup, only for the final per-doc count.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    )
    lut = broadcast(words.select("word", F.col("syms").alias("__syms")))
    pieces = F.coalesce(
        F.size("__syms"), F.size(_chars_with_eow(F.col("word"), end_of_word))
    )
    return (
        toks.join(lut, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(pieces).cast("long").alias("n_pieces"),
        )
    )


def heavy_hitters_mg(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    top: int | None = None,
) -> DataFrame:
    """Approximate frequent tokens via mergeable Misra–Gries summaries
    (Agarwal et al. 2013 "Mergeable Summaries"): each partition keeps at
    most ``k`` counters, so only ``k`` rows per partition ever reach the
    shuffle — the point of the sketch at 100 TB, where the exact
    ``groupBy(token)`` shuffles the full token dictionary.

    Guarantee: any token with true frequency > N/(k+1) survives, and
    each reported ``mg_count`` is an UNDER-estimate within N·(#summaries)
    /(k+1) of the truth (the classic MG bounds, summed over merges) —
    re-count the survivors exactly in a second pass when exact numbers
    matter (that pass is a ``k``-row broadcast semi-join, not a full
    aggregation).

    Implementation is Arrow-batched and vectorized: per pandas batch a
    C-speed ``value_counts``, then the counter-level MG merge (add,
    subtract the (k+1)-th largest, drop non-positive) — no per-row
    Python.
    """

    def summarize(batches):
        import pandas as pd

        acc = pd.Series(dtype="int64")
        for pdf in batches:
            # dropna BEFORE astype: astype(str) renders missing text as
            # the literal tokens 'None'/'nan', which would then outrank
            # real tokens on a NULL-heavy shard
            vc = (
                pdf[text_col]
                .dropna()
                .astype(str)
                .str.lower()
                .str.split()
                .explode()
                .dropna()
                .value_counts()
            )
            acc = acc.add(vc, fill_value=0).astype("int64")
            if len(acc) > k:
                # mergeable-summary reduction: subtract the (k+1)-th
                # largest count from everyone, keep the positives
                pivot = acc.nlargest(k + 1).iloc[-1]
                acc = acc - pivot
                acc = acc[acc > 0]
        yield pd.DataFrame({"token": acc.index.astype(str), "mg_count": acc.values})

    summaries = docs.select(text_col).mapInPandas(
        summarize, schema="token string, mg_count long"
    )
    merged = summaries.groupBy("token").agg(
        F.sum("mg_count").cast("long").alias("mg_count")
    )
    out = merged.orderBy(F.col("mg_count").desc(), F.col("token"))
    return out.limit(top) if top is not None else out


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """BM25 top-``k`` document retrieval for a (query_id, term) query
    set — the lexical-retrieval primitive (Robertson/Lucene scoring):

        score(q, d) = Σ_t∈q  idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))

    Plan shape: one (doc, term) partial-aggregated groupBy for tf, one
    map-side length projection; the QUERY side is small by contract and
    broadcast-SEMI-joins the tf table first, so only postings for query
    terms survive — df is then a partial-aggregated groupBy over the
    survivors (per-term counts are unchanged by the query filter; the
    output is ≤ |query terms| rows and broadcasts back), not a
    vocabulary-wide aggregation.  N and avgdl ride as a one-row broadcast dimension (no
    driver-side count).  The per-(query, doc) sum folds term scores in
    sorted-term order (groups are ≤ |query| terms), so the IEEE sum is
    a pure function of the corpus on any engine; ties rank by doc id.

    Reference analogue: none (the reference has no IR scoring) —
    north-star scope: retrieval-based decontamination and hard-negative
    mining both need corpus-scale BM25.

    Query terms are matched VERBATIM against the tokenizer's output,
    which is lowercased — callers must lowercase their terms (the
    curate CLI does).
    """
    tf = _doc_terms(docs, id_col, text_col)
    # N and avgdl describe the SCOREABLE corpus: NULL-text rows have no
    # postings and a NULL token-size, so counting them into N while
    # avg() skips their NULL __dl would inflate every idf against the
    # average that normalizes tf
    dl = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(tokens(text_col)).cast("double").alias("__dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    q = broadcast(
        queries.select(
            F.col(query_id_col), F.col(term_col).alias("term")
        ).distinct()
    )
    # Drop non-query postings FIRST (broadcast semi-join on the terms):
    # per-term row counts are unchanged by the filter, so df computed
    # over the SURVIVORS is the true corpus df for every query term —
    # a partial-aggregated groupBy whose output is ≤ |distinct query
    # terms| rows (broadcastable BY the small-query contract), where
    # the former df pass aggregated the whole vocabulary.  Deliberately
    # a groupBy + broadcast join-back, NOT a window over the term key:
    # a query containing a stop word would funnel that term's entire
    # postings into one window task with no partial aggregation (see
    # tfidf_topk's in-body note for the same adjudication).
    tf = tf.join(broadcast(q.select("term").distinct()), "term", "semi")
    # NOTE (round 12): tfidf_topk's exchange-reuse trick (count through
    # an always-true ``tf`` reference so the df child stays canonically
    # identical to the scoring-side tf) does NOT transfer here — the
    # scoring side inner-joins ``dl`` on the doc id, and Catalyst
    # infers ``isnotnull(doc_id)`` into that side's scan only, so the
    # two children can never canonically match.  Filtering null ids out
    # of the df side too would change what df counts on a null-id
    # corpus (the oracle counts them), so the df branch keeps its own
    # query-bounded second pass.
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    tf = tf.join(broadcast(df_t), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    per_term = (
        tf.join(q, "term")
        .join(dl, id_col)
        .crossJoin(broadcast(stats))
        .select(
            query_id_col,
            id_col,
            "term",
            (idf * tf_part).alias("__s"),
        )
    )
    # deterministic fold: sort the (≤ |query|) term scores before
    # summing so both engines add in the same IEEE order
    summed = (
        per_term.groupBy(query_id_col, id_col)
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("term"), F.col("__s")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["__s"],
            ).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_matched"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        summed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("bm25", 6).alias("bm25"),
            "n_matched",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def corpus_token_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus statistics over the unigram distribution — the
    dataset-card numbers every training corpus ships with: token and
    type counts, Shannon entropy of the token distribution (nats), and
    the most frequent token with its corpus share (the head of the Zipf
    curve).

    Plan shape: one vocabulary-sized partial-aggregated groupBy, then a
    single global aggregate over the vocabulary table (thousands of
    rows, not corpus rows).  The vocabulary-level double sums are
    rounded to 6 dp — ordering ulp noise is ~1e-13 on a 1e5-type vocab,
    far below the rounding.  Ties for the top token break lexically.
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    total = F.sum("__c")
    p = F.col("__c") / total
    return counts.agg(
        total.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round((-F.sum(F.col("__c") * F.log(F.col("__c"))) / total
                 + F.log(total)), 6).alias("entropy"),
        F.min(
            F.struct((-F.col("__c")).alias("nc"), F.col("term").alias("t"))
        )["t"].alias("top_token"),
        F.round(F.max("__c") / total, 6).alias("top_frac"),
    )
