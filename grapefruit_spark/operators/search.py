"""Corpus search / term-weighting operators (SURVEY §2 block D, search).

TF-IDF per-doc top terms and BM25 ranked retrieval over ``documents`` —
the indexing/scoring half of a training-data pipeline (used for quality
filtering, topic balancing, and query-based corpus slicing). These are
what the reference's grep/WordCount demo apps
(`/root/reference/src/main/java/edu/cs425/mp3/app/`, wg/wc executables)
grow into once term statistics matter, re-expressed as declarative
aggregations instead of per-file map/reduce executables.

Scale notes: document/corpus frequency is computed with groupBy(term) +
join-back (map-side partial aggregation keeps a stopword term from
concentrating its posting list in one task); the corpus-level scalars
(N, avgdl) are 1-row aggregates broadcast into the scoring map. BM25 never explodes tokens at all — per-query-term counts
are higher-order array ops inside codegen, so the scan stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import spread, table
from ..functions import (
    materialize_ctes,
    md5_hash60,
    md5_hash60_sql,
    word_ngrams,
    ws_tokens,
)

ORACLE: dict[str, str] = {}

_DUCK_TOKENS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0)"

TOP_TERMS = 5


# ------------------------------------------------------------- tf-idf
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (idf = ln((N+1)/(df+1))).

    explode → (doc,term) count → df via groupBy(term) + join-back (no
    second explode) → broadcast scalar N → rank window per doc. Scores
    rounded to 6 dp BEFORE ranking so both engines rank identically.
    """
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    tfreq = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df via groupBy + join-back, NOT a per-term window: partial (map-side)
    # aggregation makes the count skew-proof, whereas a window on a
    # stopword term would concentrate its whole posting list in one task.
    # The join redistributes by term with AQE skew-split available; the df
    # table is one row per distinct term (vocab-sized, can exceed broadcast
    # at corpus scale, so it stays a shuffle join).
    dfs = tfreq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq = tfreq.join(dfs, "term")
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # floor-scaled integer score used for BOTH ranking and emission:
    # floor of the identical double is deterministic cross-engine where
    # round()'s half-rule is not, and ranking on the integer keeps tie
    # resolution (term ASC) identical on both sides
    scored = dfreq.join(F.broadcast(total)).withColumn(
        "score_e6",
        F.floor(
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1000000
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "score_e6", "rank")
    )


ORACLE["tfidf_top_terms"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
),
tfreq AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
dfreq AS (
    SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tfreq
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score_e6, rank FROM (
    SELECT doc_id, term, tf, df,
           CAST(floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000000) AS BIGINT) AS score_e6,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000000) DESC, term ASC
           ) AS rank
    FROM dfreq, n
)
WHERE rank <= {TOP_TERMS}
"""


# --------------------------------------------------------------- bm25
BM25_QUERY = ("spark", "vector", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed term query.

    No token explode: per-term tf is an array filter inside codegen;
    N/df/avgdl are one 1-row aggregate broadcast into the scoring map.
    Okapi BM25 (Robertson-Sparck Jones idf, ln(1 + (N-df+.5)/(df+.5))).
    """
    from ..reliability import pin

    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))

    def _tf(term: str):
        # closure factory: a default-arg lambda would change the arity
        # pyspark introspects for higher-order functions
        return F.size(F.filter(F.col("tk"), lambda t: t == F.lit(term)))

    # r15 (guide §7.2 duplicated-subtree audit): tokenize ONCE — the
    # regex split previously inlined into dl AND every per-term tf
    # (CollapseProject re-inlines cheap-looking aliases; staging tk in
    # its own projection keeps one evaluation since the alias is
    # referenced 5×, which the collapse rule treats as non-cheap), and
    # the whole scan ran TWICE (stats agg + scoring join). The pinned
    # base is 6 ints/row — the inverted-stats artifact a real BM25
    # deployment stores — so both consumers read one materialization.
    staged = docs.select("doc_id", toks.alias("tk"))
    base = pin(
        staged.select(
            "doc_id",
            F.size("tk").alias("dl"),
            *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(BM25_QUERY)],
        )
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    norm = BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    score = sum(
        (
            F.log(
                1.0
                + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            )
            * F.col(f"tf_{i}")
            * (BM25_K1 + 1)
            / (F.col(f"tf_{i}") + norm)
        )
        for i in range(len(BM25_QUERY))
    )
    # floor-scaled integer score for selection, ranking AND emission —
    # deterministic cross-engine where round()'s half-rule is not
    top = (
        base.join(F.broadcast(stats))
        .select("doc_id", F.floor(score * 1000000).alias("bm25_e6"))
        .where(F.col("bm25_e6") > 0)
        .orderBy(F.desc("bm25_e6"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )
    # rank the 20 finalists only — TakeOrdered did the global selection, so
    # the single-partition window never sees more than BM25_TOP rows
    w = Window.orderBy(F.desc("bm25_e6"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


def _duck_tf(term: str) -> str:
    return f"len(list_filter(toks, t -> t = '{term}'))"


_tf_cols = ",\n           ".join(f"{_duck_tf(t)} AS tf_{i}" for i, t in enumerate(BM25_QUERY))
_df_cols = ", ".join(
    f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(BM25_QUERY))
)
_score_sum = "\n         + ".join(
    f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
    f" * tf_{i} * ({BM25_K1} + 1)"
    f" / (tf_{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))"
    for i in range(len(BM25_QUERY))
)
ORACLE["bm25_search"] = f"""
WITH base AS (
    SELECT doc_id, len(toks) AS dl,
           {_tf_cols}
    FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
),
stats AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl, {_df_cols} FROM base
)
SELECT doc_id, bm25_e6, rank FROM (
    SELECT doc_id, bm25_e6,
           row_number() OVER (ORDER BY bm25_e6 DESC, doc_id ASC) AS rank
    FROM (
        SELECT doc_id,
               CAST(floor(({_score_sum}) * 1000000) AS BIGINT) AS bm25_e6
        FROM base, stats
    )
    WHERE bm25_e6 > 0
)
WHERE rank <= {BM25_TOP}
"""


# ------------------------------------------------------------------ D29
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: per-doc mean negative log-probability of
    its tokens under the corpus unigram distribution (a cheap perplexity
    proxy — high avg_neg_logp ⇒ rare/garbled text, low ⇒ boilerplate).

    Same shuffle shape as tfidf: explode → groupBy(term) + join-back for
    global counts (partial aggs, skew-proof) → broadcast 1-row total →
    re-aggregate per doc (second shuffle). Rounded to 6 dp so JVM/libm
    ln() agree with DuckDB's.
    """
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    # per-(doc,term) tf first: shrinks rows before the term window and
    # makes the per-doc mean an exact weighted sum
    tfreq = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus frequency via groupBy + join-back (skew-proof partial aggs),
    # not a per-term window — see tfidf_top_terms
    cfs = tfreq.groupBy("term").agg(F.sum("tf").alias("cf"))
    cfreq = tfreq.join(cfs, "term")
    total = (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("t"))
        .agg(F.count(F.lit(1)).alias("n_corpus"))
    )
    scored = cfreq.join(F.broadcast(total))
    # each addend folds through DECIMAL(28,12): exact (order-independent)
    # per-doc sums under any partitioning; emission is floor(x·10⁶) of
    # the identical double (same device as doc_entropy)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(
                (F.col("tf") * -F.log(F.col("cf") / F.col("n_corpus"))).cast(
                    "decimal(28,12)"
                )
            ).alias("snl"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("snl").cast("double") / F.col("n_tokens") * 1000000).alias(
                "avg_neg_logp_e6"
            ),
        )
    )


ORACLE["doc_unigram_logprob"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
),
tfreq AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
cfreq AS (
    SELECT *, sum(tf) OVER (PARTITION BY term) AS cf FROM tfreq
),
n AS (SELECT count(*) AS n_corpus FROM toks)
SELECT doc_id,
       sum(tf)::BIGINT AS n_tokens,
       CAST(floor(sum(CAST(tf * -ln(cf / n_corpus) AS DECIMAL(28,12)))::DOUBLE
                  / sum(tf) * 1000000) AS BIGINT) AS avg_neg_logp_e6
FROM cfreq, n
GROUP BY doc_id
"""


# ------------------------------------------------------- vocab coverage
VOCAB_KS = (100, 1_000, 10_000)


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary planning: what fraction of corpus token
    occurrences do the top-K most frequent types cover, for K ∈ {100, 1k,
    10k}? The curve that sizes a vocab / flags heavy-tail corpora.

    Term counts are one skew-proof hash aggregate; each K's finalists
    come from a distributed TakeOrderedAndProject (orderBy().limit(K) —
    never a global rank window over the whole vocabulary), and the
    coverage ratio is one integer-exact division per row.
    """
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = tf.agg(F.sum("c").alias("total"))
    parts = []
    for k in VOCAB_KS:
        topk = tf.orderBy(F.desc("c"), F.asc("term")).limit(k)
        parts.append(
            topk.agg(
                F.lit(k).alias("k"),
                F.count(F.lit(1)).alias("vocab_used"),
                F.sum("c").alias("covered"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # coverage as integer parts-per-million: (covered * 1e6) div total is
    # exact bigint math on both engines, immune to the cross-engine
    # last-ulp divergence a double `round(covered/total, 6)` carries
    # (same device as order_cohort_ltv's integer cents). Both operands are
    # (Both Spark `div` and DuckDB integer `//` truncate toward zero, so
    # they agree even on negatives — pinned by the props_agg pytest.)
    return out.join(F.broadcast(total)).select(
        "k",
        "vocab_used",
        "covered",
        F.expr("(covered * 1000000L) div total").alias("coverage_ppm"),
    )


def _vocab_coverage_oracle() -> str:
    one = """
SELECT {k} AS k, count(*) AS vocab_used, CAST(sum(c) AS BIGINT) AS covered,
       CAST((sum(c) * 1000000) // (SELECT sum(c) FROM tf) AS BIGINT) AS coverage_ppm
FROM (SELECT c FROM tf ORDER BY c DESC, term ASC LIMIT {k})
"""
    return (
        f"WITH tf AS (SELECT term, count(*) AS c FROM "
        f"(SELECT unnest({_DUCK_TOKENS}) AS term FROM documents) GROUP BY 1)\n"
        + "\nUNION ALL\n".join(one.format(k=k) for k in VOCAB_KS)
    )


ORACLE["vocab_coverage"] = _vocab_coverage_oracle()


# ------------------------------------------------------------------ D45
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware corpus-LM quality score (r8): per-doc mean
    surprisal −ln P(w₂|w₁) of its token BIGRAMS under the corpus bigram
    model (P estimated as n(w₁w₂)/n(w₁·), the Markov estimator). The
    sequence-structure upgrade of doc_unigram_logprob: a doc built from
    common words in UNUSUAL ORDER scores normal there but high here —
    the shape perplexity-based data curation actually keys on.

    Docs with < 2 tokens have no bigrams and are absent (the same
    contract as events_markov_surprisal's single-event users). Plan:
    bigrams via the zip_with shingle fold (no per-gram slicing), per-
    (doc, bigram) tf first so the stats joins see collapsed rows, corpus
    stats via groupBy + join-back (skew-proof partial aggs, the tfidf
    layout). Cross-engine ln parity: per-addend DECIMAL(28,12)
    quantization, floor(avg·10⁶) emission.
    """
    # r14: catalog.spread — tokenization otherwise runs inside the
    # one-task local scan; the decimal surprisal fold is order-free
    docs = spread(table(spark, sf_dir, "documents"))
    toks = ws_tokens(F.lower(F.col("text")))
    bgs = docs.select(
        "doc_id", F.explode(word_ngrams(toks, 2)).alias("bg")
    )
    tf = bgs.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("tf"))
    bgc = tf.groupBy("bg").agg(F.sum("tf").alias("n_bg"))
    w1c = (
        bgc.select(F.split("bg", " ").getItem(0).alias("w1"), "n_bg")
        .groupBy("w1")
        .agg(F.sum("n_bg").alias("n_from"))
    )
    scored = (
        tf.join(bgc, "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(w1c, "w1")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(
                (F.col("tf") * -F.log(F.col("n_bg") / F.col("n_from"))).cast(
                    "decimal(28,12)"
                )
            ).alias("ssum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.floor(
                F.col("ssum").cast("double") / F.col("n_bigrams") * 1000000
            ).alias("avg_surprisal_e6"),
        )
    )


ORACLE["doc_bigram_surprisal"] = f"""
WITH toks AS (
    SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
bgs AS (
    SELECT doc_id,
           unnest([array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))]) AS bg
    FROM toks WHERE len(tk) >= 2
),
tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgs GROUP BY 1, 2),
bgc AS (SELECT bg, sum(tf) AS n_bg FROM tf GROUP BY 1),
w1c AS (
    SELECT string_split(bg, ' ')[1] AS w1, sum(n_bg) AS n_from
    FROM bgc GROUP BY 1
)
SELECT t.doc_id,
       sum(t.tf)::BIGINT AS n_bigrams,
       CAST(floor(sum(CAST(t.tf * -ln(b.n_bg / w.n_from) AS DECIMAL(28,12)))::DOUBLE
                  / sum(t.tf) * 1000000) AS BIGINT) AS avg_surprisal_e6
FROM tf t
JOIN bgc b USING (bg)
JOIN w1c w ON string_split(t.bg, ' ')[1] = w.w1
GROUP BY t.doc_id
"""


# ------------------------------------------------------------------ D47
#: stupid-backoff discount (Brants et al., "Large Language Models in
#: Machine Translation", EMNLP 2007 — the score that replaces smoothed
#: probabilities at corpus scale)
BACKOFF_ALPHA = 0.4
#: model split: docs whose hash bucket falls below 50% train the model
BACKOFF_MODEL_FRAC = 0.5


def doc_backoff_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out corpus-LM scoring with TRIGRAM stupid backoff (r13;
    Brants et al. 2007 run trigram-or-higher order in practice): per-doc
    mean −ln S(w₃|w₁w₂) where the model is trained on a deterministic
    50% hash split of the corpus and ALL docs are scored against it.

    The full four-level Brants recursion, each level α-discounted once
    more than the last:

        S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂·)   if the trigram is in the model
                   = α · c(w₂w₃)/c(w₂·)    else, if the bigram is
                   = α² · c(w₃)/N          else, if w₃ is a model unigram
                   = α² · 1/N              else (OOV word, count 1)

    bo_bigram / bo_unigram / bo_oov count how many of the doc's trigrams
    resolved at each backoff level — the distribution-shift profile of
    the doc against the reference corpus (and the branch-coverage gauge
    the adversarial gate pins). Membership is the same narrow md5-bucket
    map as split_train_val, so the split is reproducible on any cluster.

    Plan (r14 restructure, guide §2.3): one explode per doc for trigram
    tf; the four-level backoff lookup then resolves per DISTINCT
    trigram, not per (doc, trigram) — the five model tables join a
    deduplicated trigram frame (each on its own key, skew-proof partial
    aggs, never a corpus×corpus join) producing one (tg → −ln S, level)
    score row per distinct trigram, and the per-doc tf frame joins that
    score table ONCE. The per-(doc, trigram) addend tf·(−ln S) is the
    identical double product either way, so the DECIMAL(28,12)
    quantization and the floor(avg·10⁶) emission — the
    doc_bigram_surprisal parity contract — are bit-unchanged; what
    changes is the shuffle bill: the corpus-sized tf frame crosses the
    network twice (score join + doc rollup) instead of six times.

    The per-doc score table is a shared artifact (doc_perplexity_buckets
    buckets it — CCNet's "write the scores table" step): it flows
    through the session memo as "backoff_scores" when active
    (bit-identical; the memo only skips recomputation)."""
    from ._memo import memoized_frame

    return memoized_frame(
        spark,
        sf_dir,
        "backoff_scores",
        lambda: _doc_backoff_surprisal_build(spark, sf_dir),
    )


def _doc_backoff_surprisal_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datapipe import _U32, _bucket

    # r14: catalog.spread measured HERE: 2.19 -> 2.73 s — the fan-out
    # exchange feeds six model-table branches and its round trip costs
    # more than the one-task tokenize it parallelizes. Left unspread.
    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    is_model = _bucket(F.col("doc_id")) < int(BACKOFF_MODEL_FRAC * _U32)
    base = docs.select("doc_id", is_model.alias("is_model"), toks.alias("tk"))
    tgs = base.select(
        "doc_id", "is_model", F.explode(word_ngrams(F.col("tk"), 3)).alias("tg")
    )
    tf = tgs.groupBy("doc_id", "is_model", "tg").agg(F.count(F.lit(1)).alias("tf"))
    tgc_m = tf.where("is_model").groupBy("tg").agg(F.sum("tf").alias("n_tg"))
    ctx_m = (
        tgc_m.select(
            F.split("tg", " ").getItem(0).alias("w1"),
            F.split("tg", " ").getItem(1).alias("w2"),
            "n_tg",
        )
        .groupBy("w1", "w2")
        .agg(F.sum("n_tg").alias("n_ctx"))
    )
    # bigram model tables are built from the BIGRAM explode (a doc's
    # final bigram exists even where no trigram contains it), matching
    # the r9 bigram-order model exactly at its own level
    bgs_m = base.where("is_model").select(
        F.explode(word_ngrams(F.col("tk"), 2)).alias("bg")
    )
    bgc_m = bgs_m.groupBy("bg").agg(F.count(F.lit(1)).alias("n_bg"))
    bfrom_m = (
        bgc_m.select(F.split("bg", " ").getItem(0).alias("bw1"), "n_bg")
        .groupBy("bw1")
        .agg(F.sum("n_bg").alias("n_from"))
    )
    uni_m = (
        base.where("is_model")
        .select(F.explode("tk").alias("w3"))
        .groupBy("w3")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    ntot = uni_m.agg(F.sum("n_w").cast("bigint").alias("n_total"))
    a = F.lit(BACKOFF_ALPHA)
    s = (
        F.when(F.col("n_tg").isNotNull(), F.col("n_tg") / F.col("n_ctx"))
        .when(F.col("n_bg").isNotNull(), a * F.col("n_bg") / F.col("n_from"))
        .when(F.col("n_w").isNotNull(), a * a * F.col("n_w") / F.col("n_total"))
        .otherwise(a * a / F.col("n_total"))
    )
    off_tg = F.col("n_tg").isNull()
    off_bg = off_tg & F.col("n_bg").isNull()
    # score each DISTINCT trigram once: −ln S (the identical double the
    # per-(doc,trigram) formulation computed — same inputs, same ops)
    # plus the resolved backoff level, so the corpus-sized tf frame
    # never re-shuffles through the five model joins
    score_tbl = (
        tf.select("tg")
        .distinct()
        .select(
            "tg",
            F.split("tg", " ").getItem(0).alias("w1"),
            F.split("tg", " ").getItem(1).alias("w2"),
            F.split("tg", " ").getItem(2).alias("w3"),
        )
        .withColumn("bg", F.concat_ws(" ", F.col("w2"), F.col("w3")))
        .join(tgc_m, "tg", "left")
        .join(ctx_m, ["w1", "w2"], "left")
        .join(bgc_m, "bg", "left")
        .join(bfrom_m, F.col("w2") == F.col("bw1"), "left")
        .join(uni_m, "w3", "left")
        .join(F.broadcast(ntot))
        .select(
            "tg",
            (-F.log(s)).alias("nls"),
            (off_tg & F.col("n_bg").isNotNull()).alias("lvl_bg"),
            (off_bg & F.col("n_w").isNotNull()).alias("lvl_uni"),
            (off_bg & F.col("n_w").isNull()).alias("lvl_oov"),
        )
    )
    scored = tf.join(score_tbl, "tg")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_trigrams"),
            F.sum(
                F.when(F.col("lvl_bg"), F.col("tf")).otherwise(0)
            ).cast("bigint").alias("bo_bigram"),
            F.sum(
                F.when(F.col("lvl_uni"), F.col("tf")).otherwise(0)
            ).cast("bigint").alias("bo_unigram"),
            F.sum(
                F.when(F.col("lvl_oov"), F.col("tf")).otherwise(0)
            ).cast("bigint").alias("bo_oov"),
            F.sum((F.col("tf") * F.col("nls")).cast("decimal(28,12)")).alias("ssum"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "bo_bigram",
            "bo_unigram",
            "bo_oov",
            F.floor(
                F.col("ssum").cast("double") / F.col("n_trigrams") * 1000000
            ).alias("avg_surprisal_e6"),
        )
    )


def _backoff_oracle() -> str:
    from .datapipe import _U32, _duck_bucket

    thr = int(BACKOFF_MODEL_FRAC * _U32)
    a = f"CAST({BACKOFF_ALPHA} AS DOUBLE)"
    return f"""
WITH toks AS (
    SELECT doc_id, {_duck_bucket("doc_id")} < {thr} AS is_model,
           {_DUCK_TOKENS} AS tk
    FROM documents
),
tgs AS (
    SELECT doc_id, is_model,
           unnest([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]) AS tg
    FROM toks WHERE len(tk) >= 3
),
tf AS (SELECT doc_id, is_model, tg, count(*) AS tf FROM tgs GROUP BY 1, 2, 3),
tgc_m AS (SELECT tg, sum(tf) AS n_tg FROM tf WHERE is_model GROUP BY 1),
ctx_m AS (
    SELECT string_split(tg, ' ')[1] AS w1, string_split(tg, ' ')[2] AS w2,
           sum(n_tg) AS n_ctx
    FROM tgc_m GROUP BY 1, 2
),
bgs_m AS (
    SELECT unnest([array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))]) AS bg
    FROM toks WHERE is_model AND len(tk) >= 2
),
bgc_m AS (SELECT bg, count(*) AS n_bg FROM bgs_m GROUP BY 1),
bfrom_m AS (
    SELECT string_split(bg, ' ')[1] AS bw1, sum(n_bg) AS n_from
    FROM bgc_m GROUP BY 1
),
uni_m AS (
    SELECT w3, count(*) AS n_w FROM (
        SELECT unnest(tk) AS w3 FROM toks WHERE is_model
    ) GROUP BY 1
),
ntot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM uni_m)
SELECT t.doc_id,
       sum(t.tf)::BIGINT AS n_trigrams,
       CAST(sum(CASE WHEN g.n_tg IS NULL AND b.n_bg IS NOT NULL
                     THEN t.tf ELSE 0 END) AS BIGINT) AS bo_bigram,
       CAST(sum(CASE WHEN g.n_tg IS NULL AND b.n_bg IS NULL
                          AND u.n_w IS NOT NULL
                     THEN t.tf ELSE 0 END) AS BIGINT) AS bo_unigram,
       CAST(sum(CASE WHEN g.n_tg IS NULL AND b.n_bg IS NULL
                          AND u.n_w IS NULL
                     THEN t.tf ELSE 0 END) AS BIGINT) AS bo_oov,
       CAST(floor(sum(CAST(t.tf * -ln(
               CASE WHEN g.n_tg IS NOT NULL THEN g.n_tg / c.n_ctx
                    WHEN b.n_bg IS NOT NULL THEN {a} * b.n_bg / f.n_from
                    WHEN u.n_w IS NOT NULL THEN {a} * {a} * u.n_w / n.n_total
                    ELSE {a} * {a} / n.n_total END
           ) AS DECIMAL(28,12)))::DOUBLE / sum(t.tf) * 1000000) AS BIGINT)
           AS avg_surprisal_e6
FROM tf t
LEFT JOIN tgc_m g USING (tg)
LEFT JOIN ctx_m c ON string_split(t.tg, ' ')[1] = c.w1
                 AND string_split(t.tg, ' ')[2] = c.w2
LEFT JOIN bgc_m b ON string_split(t.tg, ' ')[2] || ' ' ||
                     string_split(t.tg, ' ')[3] = b.bg
LEFT JOIN bfrom_m f ON string_split(t.tg, ' ')[2] = f.bw1
LEFT JOIN uni_m u ON string_split(t.tg, ' ')[3] = u.w3
CROSS JOIN ntot n
GROUP BY t.doc_id
"""


ORACLE["doc_backoff_surprisal"] = _backoff_oracle()


# ------------------------------------------------------------------ D51
#: perplexity-bucket bin width: 0.01 nat in e6 surprisal units. CCNet's
#: head/middle/tail cut needs the two tertile THRESHOLDS, not exact
#: per-doc ranks — binning the surprisal axis keeps the cumulative pass
#: O(bins) (≤ a few thousand rows at ANY corpus size: surprisals live
#: in ~[0, 25] nats) instead of a corpus-wide single-partition window.
PPLX_BIN_E6 = 10_000


def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020, r10):
    every scorable doc lands in a head / middle / tail bucket by its
    held-out stupid-backoff surprisal tertile, reported per source —
    THE quality-stratification step a pretraining pipeline runs before
    sampling (head = fluent reference-like text, tail = noise/foreign).

    Cut semantics: per-bin doc counts (bin = avg_surprisal_e6 div 10⁴,
    a 0.01-nat grid) → cumulative counts over the ≤2.5k-row bin frame
    (the one tiny ordered pass; O(bins), never O(docs)) → b1/b2 = first
    bins where 3·cum ≥ n and ≥ 2n → docs bucket by integer bin compare
    against the broadcast 1-row thresholds. Bin-boundary ties all fall
    on the same side on both engines — no rank nondeterminism. Docs
    with <3 tokens are unscorable by the trigram LM and are excluded, as
    in doc_backoff_surprisal (disclosed; CCNet likewise scores only
    tokenizable text).
    """
    from ..reliability import pin

    # pin the per-doc score table (r14, guide §5): this narrow frame
    # (one row per scorable doc) feeds THREE consumers — the bin
    # histogram, the broadcast threshold aggregate, and the final
    # per-source rollup join. Unmaterialized, each consumer re-runs the
    # whole LM build + scoring pipeline (the threshold subtree executes
    # as its own broadcast job, outside ReuseExchange's reach) —
    # measured 4.0 s vs 2.4 s for one surprisal pass at sf0.1. At scale
    # this is CCNet's "write the scores table" step.
    from ._memo import memo_active

    scored = doc_backoff_surprisal(spark, sf_dir).select(
        "doc_id",
        "n_trigrams",
        F.expr(f"avg_surprisal_e6 div {PPLX_BIN_E6}").alias("bin"),
    )
    if not memo_active("backoff_scores"):
        # r14: with the memo active the score table is already a pinned
        # shared frame (builder: doc_backoff_surprisal) — this select is
        # a trivial map over it; from scratch, pin as before
        scored = pin(scored)
    from pyspark.sql.window import Window as _W

    bins = scored.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    w = _W.orderBy("bin").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cum = bins.withColumn("cum", F.sum("c").over(w))
    thresholds = cum.join(F.broadcast(cum.agg(F.max("cum").alias("n")))).agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("bin"))).alias("b1"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("bin"))).alias("b2"),
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    bucket = (
        F.when(F.col("bin") <= F.col("b1"), "head")
        .when(F.col("bin") <= F.col("b2"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(docs, "doc_id")
        .join(F.broadcast(thresholds))
        .groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").cast("bigint").alias("n_trigrams"),
        )
        .orderBy("source", "bucket")
    )


def _pplx_buckets_oracle() -> str:
    return f"""
WITH scored AS ({_backoff_oracle()}),
binned AS (
    SELECT s.doc_id, s.n_trigrams,
           s.avg_surprisal_e6 // {PPLX_BIN_E6} AS bin
    FROM scored s
),
bins AS (SELECT bin, count(*) AS c FROM binned GROUP BY 1),
cum AS (
    SELECT bin, sum(c) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cum
    FROM bins
),
thr AS (
    SELECT min(CASE WHEN 3 * cum >= n THEN bin END) AS b1,
           min(CASE WHEN 3 * cum >= 2 * n THEN bin END) AS b2
    FROM cum CROSS JOIN (SELECT max(cum) AS n FROM cum) t
)
SELECT d.source,
       CASE WHEN b.bin <= thr.b1 THEN 'head'
            WHEN b.bin <= thr.b2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       CAST(sum(b.n_trigrams) AS BIGINT) AS n_trigrams
FROM binned b
JOIN documents d USING (doc_id)
CROSS JOIN thr
GROUP BY 1, 2
ORDER BY source, bucket
"""


ORACLE["doc_perplexity_buckets"] = _pplx_buckets_oracle()


# ------------------------------------------------------------------ D54
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase matching (r10): find every CONSECUTIVE
    occurrence of a phrase via a position join over token postings —
    the inverted-index way, not a LIKE scan. BM25 (D23) is bag-of-words;
    this is the missing exact-phrase tier of a search stack.

    The query phrase is the corpus's own most frequent bigram (count
    DESC, bigram ASC — a total order both engines agree on), so the
    operator is self-contained and non-trivial on any input corpus.

    Plan: one posexplode produces (doc_id, pos, word) postings; the
    phrase terms filter the postings BEFORE the position self-join, so
    the join input is O(postings of the two phrase words), not the
    corpus; the join key (doc_id, pos) co-partitions in one shuffle.
    At 100 TB this is the standard positional-posting merge — postings
    lists of the query terms only, never a full-corpus pass past the
    initial posting build a real index would have materialized already.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("tk"))
    top_bg = (
        toks.select(F.explode(word_ngrams(F.col("tk"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bg"))
        .limit(1)
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
            F.col("bg").alias("phrase"),
        )
    )
    post = toks.select(
        "doc_id", F.posexplode("tk").alias("pos", "w")
    )
    p1 = post.join(F.broadcast(top_bg), post.w == F.col("w1")).select(
        "doc_id", F.col("pos").alias("pos1"), "phrase"
    )
    p2 = post.join(F.broadcast(top_bg.select("w2")), post.w == F.col("w2")).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("pos2")
    )
    hits = p1.join(
        p2,
        (p1.doc_id == p2.d2) & (F.col("pos2") == F.col("pos1") + 1),
    )
    return (
        hits.groupBy("doc_id", "phrase")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pos1").cast("bigint").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


ORACLE["phrase_search"] = f"""
WITH toks AS (
    SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
bgs AS (
    SELECT unnest([array_to_string(tk[i:i+1], ' ')
                   FOR i IN range(1, len(tk))]) AS bg
    FROM toks WHERE len(tk) >= 2
),
top_bg AS (
    SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
           bg AS phrase
    FROM (SELECT bg, count(*) AS cnt FROM bgs GROUP BY 1
          ORDER BY cnt DESC, bg ASC LIMIT 1)
),
post AS (
    SELECT doc_id, u.p AS pos, u.w AS w
    FROM toks, unnest([{{'p': i, 'w': tk[i + 1]}} FOR i IN range(0, len(tk))]) AS t(u)
)
SELECT h1.doc_id, tb.phrase,
       count(*) AS n_hits,
       CAST(min(h1.pos) AS BIGINT) AS first_pos
FROM post h1
JOIN top_bg tb ON h1.w = tb.w1
JOIN post h2 ON h2.doc_id = h1.doc_id AND h2.pos = h1.pos + 1 AND h2.w = tb.w2
GROUP BY h1.doc_id, tb.phrase
ORDER BY h1.doc_id
"""


# ----------------------------------------------------------------- D60
PMI_TOP_V = 40  # vocabulary cap: pairs bounded by C(40,2) = 780


def term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of term co-occurrence at the
    DOCUMENT level (Church & Hanks 1990), over the PMI_TOP_V highest-df
    terms: pmi(x,y) = ln(N·df_xy / (df_x·df_y)). Positive = the pair
    collocates (phrases, topical pairs — boilerplate shows up as a
    block of saturated-PMI pairs); negative = the terms repel
    (near-perfect complementary distribution is a template/source
    signature). The standard corpus-association report.

    Scale: the vocabulary cap is what bounds it — per doc the pair
    join sees at most PMI_TOP_V rows, so the pair frame is
    O(docs·C(V,2)/N_distinct) and the output ≤ C(V,2) rows regardless
    of corpus size; the cap frame itself is V rows (fixed, like
    region/nation) so its semi-joins may broadcast. ln parity via the
    house DECIMAL(28,12) quantization of one IEEE-identical ratio.
    """
    docs = table(spark, sf_dir, "documents")
    # r14: catalog.spread measured HERE (pmi is pair-join-bound): 1.21 ->
    # 1.37 s — the fan-out shuffle exceeds the one-task tokenize it
    # parallelizes. Left unspread.
    dt = (
        docs.select("doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term"))
        .distinct()
    )
    top = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(PMI_TOP_V)
    )
    filt = dt.join(F.broadcast(top), "term")  # V-row frame: bounded hint
    pairs = (
        filt.alias("a")
        .join(filt.alias("b"), "doc_id")
        .where(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("t1"),
            F.col("b.term").alias("t2"),
            F.col("a.df").alias("df1"),
            F.col("b.df").alias("df2"),
        )
        .agg(F.count(F.lit(1)).alias("df_pair"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))  # 1-row aggregate attach
        .select(
            "t1",
            "t2",
            "df_pair",
            "df1",
            "df2",
            "n_docs",
            F.floor(
                F.log(
                    (F.col("df_pair") * F.col("n_docs")).cast("double")
                    / (F.col("df1") * F.col("df2")).cast("double")
                ).cast("decimal(28,12)").cast("double")
                * 1000000
            ).alias("pmi_e6"),
        )
        .orderBy("t1", "t2")
    )


ORACLE["term_pmi"] = f"""
WITH dt AS (
    SELECT DISTINCT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
),
top AS (
    SELECT term, count(*) AS df FROM dt GROUP BY term
    ORDER BY df DESC, term ASC LIMIT {PMI_TOP_V}
),
filt AS (
    SELECT dt.doc_id, dt.term, top.df FROM dt JOIN top USING (term)
),
pairs AS (
    SELECT a.term AS t1, b.term AS t2, a.df AS df1, b.df AS df2,
           count(*) AS df_pair
    FROM filt a JOIN filt b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2, 3, 4
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT t1, t2,
       CAST(df_pair AS BIGINT) AS df_pair,
       CAST(df1 AS BIGINT) AS df1,
       CAST(df2 AS BIGINT) AS df2,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(CAST(CAST(ln(CAST(df_pair * n_docs AS DOUBLE)
                            / CAST(df1 * df2 AS DOUBLE)) AS DECIMAL(28,12))
                       AS DOUBLE) * 1000000) AS BIGINT) AS pmi_e6
FROM pairs CROSS JOIN n
ORDER BY t1, t2
"""


# ------------------------------------------------------------------ D69
#: DSIR hashed-feature space: word bigrams hash into this many buckets
DSIR_BUCKETS = 256
#: the "target domain" the importance weights point toward
DSIR_TARGET_LANG = "en"


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by how target-like its hashed n-gram profile
    is — log w(x) = Σ_b f_x[b] · ln(p_target[b] / p_raw[b]) over
    ``DSIR_BUCKETS`` hashed word-bigram buckets, add-1 smoothed. The
    target here is the ``lang = 'en'`` slice (in production: any
    high-quality seed corpus); positive log-weight ⇒ the doc's feature
    profile looks more like the target than the raw pool, the signal
    DSIR resamples on. The importance-weighting upgrade of
    quality_weighted_sample: instead of hand-written heuristics, the
    score IS the likelihood ratio of two corpus-level distributions.

    Scale shape: the corpus collapses to (doc, bucket) counts in one
    map-side-combined groupBy (≤ ``DSIR_BUCKETS`` rows per doc
    regardless of doc length); both feature distributions come from ONE
    O(buckets)-row aggregate over the same frame's parent (a 256-row
    frame at ANY corpus size) whose smoothed log-ratio broadcasts back
    into the per-doc scoring agg. No corpus-sized join sides, no
    windows; a hashed feature never concentrates a task because the
    bucket count is fixed. Gramless docs (< 2 tokens) surface with
    n_grams = 0 / logw = 0 via the left join, so the output is always
    total over documents.

    Cross-engine exactness: buckets from the md5-backed 60-bit hash
    (`md5_hash60`), the per-bucket log-ratio is one ln of an
    all-integer-derived double (identical IEEE op order in both
    engines), and each per-doc addend tf·lr folds through
    DECIMAL(28,12) before summing — exact, order-independent totals
    under any partitioning — with floor(·10⁶) emission (the
    doc_unigram_logprob device).
    """
    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    # r14: catalog.spread — the bigram hash explode otherwise runs
    # inside the one-task local scan (decimal fold, order-free)
    feats = spread(docs).select(
        "doc_id",
        "lang",
        F.explode(word_ngrams(toks, 2)).alias("bg"),
    ).select(
        "doc_id", "lang", (md5_hash60(F.col("bg")) % DSIR_BUCKETS).alias("bucket")
    )
    # r14 (guide §7.2 duplicated-subtree audit): both feature
    # distributions AND the per-doc scoring agg consume the corpus
    # explode, and the rate subtree executes as its own broadcast job
    # OUTSIDE ReuseExchange — unpinned, the tokenize + ngram + md5
    # explode ran TWICE. Pin the per-(doc, bucket) count frame (≤
    # DSIR_BUCKETS narrow rows/doc: int bucket/tf, boolean target flag)
    # and fold dist from it: n_raw = Σ_doc tf and n_tgt = Σ_{tgt} tf
    # per bucket are the identical integers the raw-explode aggregate
    # produced, so every downstream double is bit-unchanged. At sf0.1
    # the pin ≈ the saved explode (wash); at corpus scale one tokenize
    # pass + an O(docs·256) artifact beats two tokenize passes.
    from ..reliability import pin

    f = pin(
        feats.select(
            "doc_id",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_tgt"),
            F.col("bucket").cast("int").alias("bucket"),
        )
        .groupBy("doc_id", "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    dist = f.groupBy("bucket").agg(
        F.sum("tf").alias("n_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("tf")).otherwise(F.lit(0))).alias(
            "n_tgt"
        ),
    )
    tot = dist.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    rate = dist.join(F.broadcast(tot)).select(
        "bucket",
        F.log(
            ((F.col("n_tgt") + 1) / (F.col("t_tgt") + DSIR_BUCKETS))
            / ((F.col("n_raw") + 1) / (F.col("t_raw") + DSIR_BUCKETS))
        ).alias("lr"),
    )
    scored = (
        f.join(F.broadcast(rate), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_grams"),
            F.sum((F.col("tf") * F.col("lr")).cast("decimal(28,12)")).alias("s"),
        )
    )
    return docs.select("doc_id", "lang").join(scored, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(
            F.floor(F.col("s").cast("double") * 1000000).cast("bigint"), F.lit(0)
        ).alias("logw_e6"),
        F.when(
            F.coalesce(F.floor(F.col("s").cast("double") * 1000000), F.lit(0)) > 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("selected"),
    )


ORACLE["dsir_importance"] = f"""
WITH toks AS (
    SELECT doc_id, lang, {_DUCK_TOKENS} AS tk FROM documents
),
feats AS (
    SELECT doc_id, lang,
           {md5_hash60_sql("bg")} % {DSIR_BUCKETS} AS bucket
    FROM (
        SELECT doc_id, lang,
               unnest([array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))]) AS bg
        FROM toks WHERE len(tk) >= 2
    )
),
f AS (SELECT doc_id, bucket, count(*) AS tf FROM feats GROUP BY 1, 2),
dist AS (
    SELECT bucket, count(*) AS n_raw,
           sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS n_tgt
    FROM feats GROUP BY 1
),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM dist),
rate AS (
    SELECT bucket,
           ln(((n_tgt + 1) / (t_tgt + {DSIR_BUCKETS}))
              / ((n_raw + 1) / (t_raw + {DSIR_BUCKETS}))) AS lr
    FROM dist CROSS JOIN tot
),
scored AS (
    SELECT doc_id, sum(tf)::BIGINT AS n_grams,
           sum(CAST(tf * lr AS DECIMAL(28,12))) AS s
    FROM f JOIN rate USING (bucket)
    GROUP BY 1
)
SELECT d.doc_id, d.lang,
       coalesce(s.n_grams, 0)::BIGINT AS n_grams,
       coalesce(CAST(floor(s.s::DOUBLE * 1000000) AS BIGINT), 0) AS logw_e6,
       CASE WHEN coalesce(floor(s.s::DOUBLE * 1000000), 0) > 0
            THEN 1 ELSE 0 END::INT AS selected
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# ------------------------------------------------------------------ D82
#: hashed-bigram feature buckets / fixed-point feature scale / ridge GD
#: hyperparameters for the learned quality classifier
QC_BUCKETS = 64
QC_SCALE = 1024
QC_ITERS = 32
QC_ETA = 0.5
QC_LAM = 0.001
#: bias feature index (one past the last bucket)
QC_BIAS = QC_BUCKETS

#: classifier label: the six CONTENT rules of quality_gopher_rules; the
#: stopword rule is excluded by design (an English-lexicon prior the
#: learned filter exists to replace — and degenerate on this corpus)
_QC_RULES = (
    "r_word_count",
    "r_mean_word_len",
    "r_symbol_ratio",
    "r_bullet_lines",
    "r_ellipsis_lines",
    "r_alpha_words",
)
_QC_LABEL_SQL = " AND ".join(_QC_RULES)


def _qc_label() -> F.Column:
    # built lazily — F.expr needs an active SparkContext
    return F.expr(_QC_LABEL_SQL)


def quality_classifier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter, fit step — the CCNet/fastText move (Joulin
    et al. 2017 features; Wenzek et al. 2020 pipeline position): ridge
    least-squares on QC_BUCKETS hashed word-bigram features (+bias),
    labels = the conjunction of quality_gopher_rules' six CONTENT rules
    (word count, mean word length, symbol/bullet/ellipsis ratios, alpha
    share). The stopword rule is deliberately excluded from the label:
    it encodes an English-lexicon prior, and replacing hand lexicons
    with learned feature weights is the entire point of the
    rules → classifier upgrade (it is also degenerate on this corpus —
    0 passes — so including it would train on all-negative labels).
    This closes the rules → learned-filter loop: the rule gate is exact
    but brittle; the regression generalizes its decision to the feature
    profile and its weights transfer to UNGATED corpora.

    Scale shape: ONE distributed pass builds the exact-integer normal
    equations — per partition a dense (B+1)² int64 Gram of the fixed-
    point feature codes plus the Xᵀy vector (embedding_covariance's
    gram_partial device, O(B²×partitions) shuffle rows at any corpus
    size); the ridge solve is then a bounded driver epilogue: QC_ITERS
    unrolled gradient-descent steps on the (B+1)² matrix (a CLOSED-FORM
    solve would need an SQL-inexpressible inversion — fixed-step GD on
    a 2-smooth objective is deterministic, contractive, and mirrors as
    chained matvec CTEs, the embedding_pca device).

    Cross-engine exactness: G and c are exact integer sums (codes ≤
    1024, DECIMAL(38,0)-folded reduce); both engines then run the same
    float recurrence w ← w − η(Mw − v + λw) from w₀ = 0, so weights
    agree to accumulation-order noise (~1e-15) and the floor-scaled e6
    emission tolerates it. The feature code (tf·1024) div n_grams —
    bigint div truncates identically in both engines — with bias
    feature QC_BIAS = 1024 on EVERY document (gramless docs carry only
    the bias).

    The weight table honors the session memo (GRAPEFRUIT_CLUSTER_MEMO=1,
    VERDICT_r13 #3): the scoring row composes the same fit, and a real
    deployment broadcasts ONE stored weight artifact — under the memo
    the fit runs once per corpus snapshot. Values bit-identical either
    way (the driver gate never sets the var, so its proof stays
    from-scratch).
    """
    return spark.createDataFrame(
        _qc_fit_rows(spark, sf_dir), schema="feat int, weight_e6 bigint"
    )


def _qc_fit_rows(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    from ._memo import memoized_rows

    return memoized_rows(
        spark, sf_dir, "qc_ridge_fit", lambda: _qc_fit_rows_build(spark, sf_dir)
    )


def _qc_fit_rows_build(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    import numpy as np
    import pandas as pd

    from .text import quality_gopher_rules

    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    f = (
        docs.select("doc_id", F.explode(word_ngrams(toks, 2)).alias("bg"))
        .select("doc_id", (md5_hash60(F.col("bg")) % QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ng = f.groupBy("doc_id").agg(F.sum("tf").alias("n_grams"))
    codes = f.join(ng, "doc_id").select(
        "doc_id",
        F.col("bucket").cast("int").alias("feat"),
        F.expr(f"(tf * {QC_SCALE}) div n_grams").cast("bigint").alias("code"),
    )
    # coalesce: the gopher rule booleans are NULL for NULL-text docs and
    # the oracle's CASE WHEN maps NULL to 0 — without it the NULL label
    # reaches gram_partial via Arrow as NaN and .astype(int64) silently
    # yields INT64_MIN, corrupting X'y (ADVICE_r12)
    labels = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.coalesce(_qc_label().cast("int"), F.lit(0)).alias("y")
    )
    per_doc = labels.join(
        codes.groupBy("doc_id").agg(
            F.collect_list("feat").alias("feats"),
            F.collect_list("code").alias("codes"),
        ),
        "doc_id",
        "left",
    ).select("y", "feats", "codes")

    nf = QC_BUCKETS + 1

    def gram_partial(batches):
        acc_g = np.zeros((nf, nf), dtype=np.int64)
        acc_c = np.zeros(nf, dtype=np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            x = np.zeros((len(pdf), nf), dtype=np.int64)
            for r, (fe, co) in enumerate(zip(pdf["feats"], pdf["codes"])):
                if fe is not None and len(fe):
                    x[r, np.asarray(fe, dtype=np.int64)] = np.asarray(
                        co, dtype=np.int64
                    )
                x[r, QC_BIAS] = QC_SCALE
            y = pdf["y"].to_numpy().astype(np.int64)
            acc_g += x.T @ x
            acc_c += x.T @ y
        if not any_rows:
            return
        iu = np.triu_indices(nf)
        out = pd.DataFrame(
            {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
             "ps": acc_g[iu]}
        )
        cvec = pd.DataFrame(
            {"i": np.arange(nf, dtype="int32"),
             "j": np.full(nf, -1, dtype="int32"), "ps": acc_c}
        )
        yield pd.concat([out, cvec], ignore_index=True)

    partials = per_doc.mapInPandas(gram_partial, schema="i int, j int, ps long")
    rows = (
        partials.groupBy("i", "j")
        .agg(F.sum(F.col("ps").cast("decimal(38,0)")).cast("bigint").alias("s"))
        .collect()
    )
    n_docs = docs.count()
    g = np.zeros((nf, nf), dtype=np.float64)
    c = np.zeros(nf, dtype=np.float64)
    for r in rows:
        if r["j"] == -1:
            c[r["i"]] = float(r["s"])
        else:
            g[r["i"], r["j"]] = float(r["s"])
            g[r["j"], r["i"]] = float(r["s"])
    m = g / (n_docs * QC_SCALE * QC_SCALE)
    v = c / (n_docs * QC_SCALE)
    w = np.zeros(nf, dtype=np.float64)
    for _ in range(QC_ITERS):
        w = w - QC_ETA * (m @ w - v + QC_LAM * w)
    return [(int(i), int(np.floor(w[i] * 1e6))) for i in range(nf)]


def _qc_fit_ctes() -> str:
    """The classifier-fit pipeline as CTEs terminating in w{QC_ITERS}
    (feat, w): integer feature codes, labels from the full gopher-rules
    oracle, exact-integer G/c aggregates, then QC_ITERS unrolled GD
    matvec steps (embedding_pca's chained-CTE device)."""
    from .text import ORACLE as _TEXT_ORACLE

    gopher = _TEXT_ORACLE["quality_gopher_rules"]
    ctes = [
        f"""toksq AS (
    SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
featsq AS (
    SELECT doc_id, {md5_hash60_sql("bg")} % {QC_BUCKETS} AS bucket
    FROM (
        SELECT doc_id,
               unnest([array_to_string(tk[i:i+1], ' ')
                       FOR i IN range(1, len(tk))]) AS bg
        FROM toksq WHERE len(tk) >= 2
    )
),
fq AS (SELECT doc_id, bucket, count(*) AS tf FROM featsq GROUP BY 1, 2),
ngq AS (SELECT doc_id, sum(tf) AS n_grams FROM fq GROUP BY 1),
codesq AS (
    SELECT doc_id, CAST(bucket AS INT) AS feat,
           CAST((tf * {QC_SCALE}) // n_grams AS BIGINT) AS code
    FROM fq JOIN ngq USING (doc_id)
    UNION ALL
    SELECT doc_id, {QC_BIAS} AS feat, {QC_SCALE} AS code FROM documents
),
lblq AS (
    SELECT doc_id, CASE WHEN {_QC_LABEL_SQL} THEN 1 ELSE 0 END AS y
    FROM ({gopher})
),
gq AS (
    SELECT a.feat AS i, b.feat AS j,
           CAST(sum(CAST(a.code * b.code AS DECIMAL(38,0))) AS BIGINT) AS s
    FROM codesq a JOIN codesq b USING (doc_id)
    GROUP BY 1, 2
),
cq AS (
    SELECT x.feat AS i,
           CAST(sum(CAST(x.code * l.y AS DECIMAL(38,0))) AS BIGINT) AS s
    FROM codesq x JOIN lblq l USING (doc_id)
    GROUP BY 1
),
ndq AS (SELECT count(*)::BIGINT AS n FROM documents),
mq AS (
    SELECT i, j, CAST(s AS DOUBLE) / (ndq.n * {QC_SCALE}.0 * {QC_SCALE}.0) AS a
    FROM gq, ndq
),
vq AS (
    -- DENSE over all features: a bucket unused by every document must
    -- still carry v = 0 (numpy's dense zero default), else the weight
    -- table loses rows on tiny/hostile corpora
    SELECT fa.feat,
           coalesce(CAST(cq.s AS DOUBLE)
                    / ((SELECT n FROM ndq) * {QC_SCALE}.0), 0.0) AS v
    FROM (SELECT CAST(unnest(range(0, {QC_BIAS + 1})) AS INT) AS feat) fa
    LEFT JOIN cq ON cq.i = fa.feat
),
w0 AS (SELECT feat, 0.0 AS w FROM vq)"""
    ]
    for t in range(QC_ITERS):
        ctes.append(
            f"""mw{t} AS (
    SELECT m.i AS feat, sum(m.a * w.w) AS mw
    FROM mq m JOIN w{t} w ON m.j = w.feat GROUP BY 1
),
w{t + 1} AS (
    SELECT w.feat,
           w.w - {QC_ETA} * (coalesce(mw.mw, 0.0) - v.v + {QC_LAM} * w.w) AS w
    FROM w{t} w
    LEFT JOIN mw{t} mw USING (feat)
    JOIN vq v USING (feat)
)"""
        )
    return ",\n".join(ctes)


ORACLE["quality_classifier_fit"] = materialize_ctes(
    "WITH "
    + _qc_fit_ctes()
    + f"""
SELECT feat, CAST(floor(w * 1000000) AS BIGINT) AS weight_e6
FROM w{QC_ITERS}
"""
)


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter, scoring step: every document scored by
    the fitted ridge weights — ŷ = Σ_b w_b·(code_b/1024) + w_bias — with
    the rule label beside it and a prediction thresholded at the TRAIN-
    SET MEAN score (the natural ridge operating point on an imbalanced
    0/1 target; a fixed 0.5 cut just reproduces the base rate). The row
    is simultaneously the inference path and the train-set confusion
    table a filter deployment reviews before flipping from rules to
    model. Fit is re-derived in-process (the knn_*_recall_eval
    composition pattern); at 100 TB the weight table (65 rows) would be
    broadcast from a stored artifact, which is exactly what this plan
    does — the per-doc scan joins ONLY the broadcast weight frame plus
    one 1-row mean broadcast.

    All-integer exactness end to end: scores are integer micro-units
    built from the fit row's EMITTED e6 weights (bit-identical across
    engines), and the mean threshold is the cross-multiplied integer
    comparison score·n ≥ Σscores — no float anywhere in this operator.
    """
    from .text import quality_gopher_rules

    # re-derive the un-floored weights? No: score from the EMITTED e6
    # weights so the scoring row composes the fit row's proven values —
    # both engines then share bit-identical weights and the only float
    # is the final dot product of exact integers scaled once. Under the
    # session memo the fit computes once (VERDICT_r13 #3).
    wmap = dict(_qc_fit_rows(spark, sf_dir))

    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    f = (
        docs.select("doc_id", F.explode(word_ngrams(toks, 2)).alias("bg"))
        .select("doc_id", (md5_hash60(F.col("bg")) % QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ng = f.groupBy("doc_id").agg(F.sum("tf").alias("n_grams"))
    codes = f.join(ng, "doc_id").select(
        "doc_id",
        F.col("bucket").cast("int").alias("feat"),
        F.expr(f"(tf * {QC_SCALE}) div n_grams").cast("bigint").alias("code"),
    )
    wdf = spark.createDataFrame(
        [(int(k), int(v)) for k, v in sorted(wmap.items())],
        schema="feat int, weight_e6 bigint",
    )
    # Σ code·w_e6 is an exact integer; one final div by the scale keeps
    # the emitted score integer too (micro-units of ŷ)
    dot = (
        codes.join(F.broadcast(wdf), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("code") * F.col("weight_e6")).alias("sprod"))
    )
    bias = int(wmap[QC_BIAS])
    # coalesce NULL rule conjunctions to 0, matching the oracle's CASE
    # WHEN semantics on NULL-text docs (ADVICE_r12)
    labels = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.coalesce(_qc_label().cast("int"), F.lit(0)).alias("label")
    )
    scored = labels.join(dot, "doc_id", "left").select(
        "doc_id",
        "label",
        (
            F.expr(f"coalesce(sprod, 0L) div {QC_SCALE}")
            + F.lit(bias)
        ).cast("bigint").alias("score_e6"),
    )
    mean = scored.agg(
        F.sum("score_e6").alias("s_tot"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    return scored.join(F.broadcast(mean)).select(
        "doc_id",
        "label",
        "score_e6",
        (F.col("score_e6") * F.col("n_tot") >= F.col("s_tot"))
        .cast("int")
        .alias("predicted"),
    )


ORACLE["quality_classifier_score"] = materialize_ctes(
    "WITH "
    + _qc_fit_ctes()
    + f""",
wfit AS (
    SELECT feat, CAST(floor(w * 1000000) AS BIGINT) AS weight_e6
    FROM w{QC_ITERS}
),
dotq AS (
    SELECT c.doc_id, sum(c.code * w.weight_e6) AS sprod
    FROM (SELECT doc_id, feat, code FROM codesq WHERE feat < {QC_BIAS}) c
    JOIN wfit w USING (feat)
    GROUP BY 1
),
biasq AS (SELECT weight_e6 AS b FROM wfit WHERE feat = {QC_BIAS}),
scoredq AS (
    SELECT l.doc_id, l.y AS label,
           CAST(coalesce(d.sprod, 0) // {QC_SCALE} + b.b AS BIGINT) AS score_e6
    FROM lblq l LEFT JOIN dotq d USING (doc_id) CROSS JOIN biasq b
),
meanq AS (
    SELECT CAST(sum(score_e6) AS BIGINT) AS s_tot,
           count(*)::BIGINT AS n_tot
    FROM scoredq
)
SELECT s.doc_id, s.label, s.score_e6,
       CASE WHEN s.score_e6 * m.n_tot >= m.s_tot
            THEN 1 ELSE 0 END::INT AS predicted
FROM scoredq s CROSS JOIN meanq m
"""
)


# ----------------------------------------------------------------- D82c
#: logistic GD steps (fewer than ridge's 32: each step is a distributed
#: pass, and the σ nonlinearity converges the separable directions fast)
LOGIT_ITERS = 16
#: corpora up to this many documents run all LOGIT_ITERS GD steps in ONE
#: numpy kernel over a single applyInPandas group (the CC/pagerank/
#: triangles fused-tier device — r15, the 16 sequential collect jobs
#: were pure scheduling floor at gate/bench scale). The cap is an int64
#: SAFETY bound, not a tuning knob: the gradient partial sums satisfy
#: Σ|code·d| ≤ 1024·10¹²·n_docs, which stays inside int64 (< 2^63 ≈
#: 9.22e18) only for n_docs ≤ 8000 — above it the distributed loop's
#: DECIMAL(38,0) fold is REQUIRED for exactness, so the tier hands over.
#: Both tiers run the identical integer recurrence (exact int64 dot
#: products, floor-quantized σ, truncating-integer update); equality on
#: the driver corpus is pinned by pytest and the oracle is unchanged.
LOGIT_FUSED_MAX_DOCS = 8_000
#: fixed-point grid for the σ output (floor(σ·10¹²) — the per-addend
#: DECIMAL(28,12)-class quantization of the surprisal rows, applied to
#: exp instead of ln)
LOGIT_P_SCALE = 10**12
#: z normalizer: codes are on the 1024 grid, weights on the 10¹² grid
LOGIT_Z_DEN = QC_SCALE * LOGIT_P_SCALE


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the shared semantics of
    Spark's ``div`` and DuckDB's ``//`` (python's ``//`` floors)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def quality_classifier_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter with the LOGISTIC objective (VERDICT_r12
    order #8 attempt): fastText's actual loss (Joulin et al. 2017) is
    logistic, not ridge — this row trains it by LOGIT_ITERS fixed-step
    gradient-descent passes, σ evaluated distributedly each step
    (logistic gradients don't compress into a Gram matrix the way
    ridge's do, so per-iteration corpus passes are the honest cost of
    the upgrade — the same shape any distributed LR trainer pays).

    Cross-engine exactness — the entire recurrence is INTEGER except
    one exp() per (doc, iteration) on bit-identical double inputs:
    weights live on the 10¹² integer grid, per-doc logits are exact
    integer dot products z_num = Σ code·w (DECIMAL(38,0)-folded, so
    order-free), σ is computed on the shared double z = z_num/(1024·
    10¹²) and immediately re-quantized as p = floor(10¹²·σ(z)), the
    gradient Σ code·(p − y·10¹²) is again an exact integer, and the
    update w ← w − g div (2·1024·n) − w div 2000 (η = 1/2, ηλ = 1/2000)
    is pure truncating-integer arithmetic mirrored by DuckDB's ``//``.
    A cross-engine flip therefore needs the two engines' exp() to
    differ AND the true σ·10¹² to sit within that ulp of an integer —
    the quantization absorbs last-ulp exp disagreement everywhere else
    (the surprisal rows' ln device, applied to exp). Saturation is
    exact on both engines: z ≪ 0 → exp(−z) = +inf → p = 0; z ≫ 0 →
    exp(−z) = 0 → p = 10¹².

    Scale (r14 restructure, guide §2.3/§2.4): the sparse (doc, feat)
    code table densifies ONCE into a checkpointed per-doc row carrying
    a 65-slot code ARRAY (the feature space is a fixed 64-bucket hash
    grid + bias, so the dense row is 65 longs ≈ 0.5 KB/doc — narrower
    than the 65 sparse rows + replicated y it replaces); the
    localCheckpoint both materializes it and TRUNCATES its lineage, so
    each iteration's plan is a few nodes over an RDD scan instead of
    the full tokenize/gopher tree re-analyzed 16× (guide §3.3/§5 —
    measured ~1.4 s/step of pure driver analysis without it). Every
    iteration is then ONE pass over that frame: the per-doc logit is
    an in-row integer fold of zip_with(codes, w_literal), d = σ−y is
    pinned to its own projection (computing d in the SAME select as
    the gradient explode re-evaluates the whole dot product + exp per
    exploded slot — 65× per doc, the r14 first-attempt mistake), and
    the gradient is posexplode(transform(codes, c → c·d)) +
    groupBy(slot), whose map-side partials reduce every partition to
    ≤ 65 rows before the (only, 65·nparts-row) shuffle. The driver
    folds a 65-entry gradient per step.

    Integer ranges at ANY corpus size (ADVICE_r13): the gradient
    Σ code·d can reach 1024·10¹²·n_docs — Spark folds it as DECIMAL
    (38,0) into an unbounded Python int, and the oracle keeps it
    DECIMAL(38,0) through the update (narrowing only the per-step
    quotient, ≤ 5·10¹¹ independent of n). The per-doc logit z_num IS
    bigint-bounded corpus-independently: each step moves a weight by
    ≤ 5·10¹¹, so |w| ≤ LOGIT_ITERS·5·10¹¹ = 8·10¹² and |z_num| ≤
    65·1024·|w| ≈ 5·10¹⁷ — 18× inside int64 regardless of n_docs.

    The weight table honors the session memo (GRAPEFRUIT_CLUSTER_MEMO=1,
    VERDICT_r13 #3) like the ridge fit: under it the 16 distributed
    passes run once per corpus snapshot and the scoring row reuses the
    table. Values bit-identical either way.

    r15: corpora ≤ LOGIT_FUSED_MAX_DOCS run all GD steps in one numpy
    kernel (see the constant's int64-safety rationale and
    _logit_fused_rows' exactness note); larger corpora keep the
    distributed per-step loop. Tier equality is pinned by pytest.
    """
    return spark.createDataFrame(
        _logit_weight_rows(spark, sf_dir), schema="feat int, weight_e12 bigint"
    )


def _logit_weight_rows(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    from ._memo import memoized_rows

    return memoized_rows(
        spark,
        sf_dir,
        "qc_logit_fit",
        lambda: _logit_weight_rows_build(spark, sf_dir),
    )


def _logit_fused_rows(base, n_docs: int) -> list[tuple[int, int]]:
    """All LOGIT_ITERS GD steps in one numpy kernel over a single
    applyInPandas group (small-corpus tier; n_docs ≤ LOGIT_FUSED_MAX_DOCS
    — see the constant's int64-safety rationale).

    Bit-exactness vs the distributed loop, step for step: z = X·w is an
    exact int64 matmul (|z| ≤ 65·1024·8·10¹² ≈ 5.5e17 and every partial
    sum is bounded by Σ|code·w| < 2^63); σ is the same double expression
    floor(10¹²/(1+exp(−z/(1024·10¹²)))) the JVM path computes — the
    floor quantization absorbs last-ulp exp() disagreement exactly as
    the docstring's cross-engine argument already accepts for
    JVM-vs-DuckDB (saturation is exact: exp overflow → p = 0, exp
    underflow → p = 10¹²); the gradient X'·d is again exact int64 under
    the tier cap (Σ|code·d| ≤ 1024·10¹²·n_docs < 2^63); and the update
    uses truncate-toward-zero division on nonnegative magnitudes, the
    shared div/// semantics. Integer sums are order-free, so the fused
    fold equals the distributed DECIMAL(38,0) fold bit for bit.
    """

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        nf = QC_BUCKETS + 1
        x = np.array(pdf["codes"].tolist(), dtype=np.int64).reshape(-1, nf)
        y = pdf["y"].to_numpy(dtype=np.int64)
        yp = y * np.int64(LOGIT_P_SCALE)
        w = np.zeros(nf, dtype=np.int64)
        gden = np.int64(2 * QC_SCALE * n_docs)
        with np.errstate(over="ignore"):
            for _ in range(LOGIT_ITERS):
                z = x @ w
                p = np.floor(
                    float(LOGIT_P_SCALE)
                    / (1.0 + np.exp(-(z.astype(np.float64) / float(LOGIT_Z_DEN))))
                ).astype(np.int64)
                d = p - yp
                g = x.T @ d
                w = (
                    w
                    - np.sign(g) * (np.abs(g) // gden)
                    - np.sign(w) * (np.abs(w) // np.int64(2000))
                )
        return pd.DataFrame({"feat": np.arange(nf, dtype="int32"), "w": w})

    out = (
        base.groupBy(F.lit(1).alias("g"))
        .applyInPandas(kernel, "feat int, w long")
        .collect()
    )
    return [(int(r["feat"]), int(r["w"])) for r in out]


def _logit_weight_rows_build(
    spark: SparkSession,
    sf_dir: str,
    fused_max_docs: int = -1,
) -> list[tuple[int, int]]:
    from .text import quality_gopher_rules

    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    f = (
        docs.select("doc_id", F.explode(word_ngrams(toks, 2)).alias("bg"))
        .select("doc_id", (md5_hash60(F.col("bg")) % QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nf = QC_BUCKETS + 1
    # r14 loop restructure (guide §2.3 "aggregate before you shuffle" /
    # §2.4 "remove shuffles outright"): densify the sparse (doc, feat,
    # code) table into ONE persisted row per doc — a 65-slot long ARRAY
    # (the feature space is a fixed 64-bucket grid + bias, so the dense
    # row is narrower than the 65 sparse rows + replicated y it
    # replaces). One aggregation builds the per-doc tf map AND the gram
    # total, so the old two-groupBy + join-back feature build collapses
    # to a single shuffle; a missing bucket densifies to code 0, which
    # contributes exactly 0 to both the logit and the gradient — the
    # same value the absent sparse row contributed.
    per_doc = f.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("tf")))
        ).alias("m"),
        F.sum("tf").alias("n_grams"),
    )
    labels = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.coalesce(_qc_label().cast("int"), F.lit(0)).alias("y")
    )
    n_docs = docs.count()
    code_slots = [
        F.coalesce(
            F.expr(f"(element_at(m, {j}) * {QC_SCALE}) div n_grams"),
            F.lit(0).cast("bigint"),
        )
        for j in range(QC_BUCKETS)
    ] + [F.lit(QC_SCALE).cast("bigint")]
    # small-corpus tier (r15): all GD steps in one numpy kernel — skips
    # the checkpoint materialization AND the 16 per-step jobs; pass
    # fused_max_docs=0 to force the distributed loop (tests, _dist rows)
    if fused_max_docs < 0:
        fused_max_docs = LOGIT_FUSED_MAX_DOCS
    if 0 < n_docs <= fused_max_docs:
        fbase = labels.join(per_doc, "doc_id", "left").select(
            "y", F.array(*code_slots).alias("codes")
        )
        return _logit_fused_rows(fbase, n_docs)
    # Partition count sizes to the dense-row bound (the r13 loop's
    # sizing, kept scale-adaptive: ~200k code slots per task — a few
    # tasks at gate scale, cluster-wide at 10⁹ docs); the
    # localCheckpoint materializes base once AND truncates its lineage
    # so the 16 iteration plans are each a handful of nodes over an RDD
    # scan, not the full tokenize/gopher tree re-analyzed per step.
    nparts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism * 4,
            n_docs * nf // 200_000 + 1,
        ),
    )
    base = (
        labels.join(per_doc, "doc_id", "left")
        .select("y", F.array(*code_slots).alias("codes"))
        .repartition(nparts, "doc_id")
        .localCheckpoint()
    )

    w = {j: 0 for j in range(nf)}
    for _ in range(LOGIT_ITERS):
        # exact integer fold of the in-row dot product against the
        # current LITERAL weight array: |z_num| ≤ 65·1024·max|w| ≈
        # 5·10¹⁷ (docstring bound), so the plain long fold equals the
        # old decimal-fold-then-narrow bit for bit — integer sums are
        # order-free. The literal changes per step, but the plan is
        # tiny (checkpointed scan), so re-analysis is sub-ms.
        wlit = "array(" + ",".join(f"{int(w[j])}L" for j in range(nf)) + ")"
        z_num = F.expr(
            f"aggregate(zip_with(codes, {wlit}, (c, x) -> c * x),"
            " 0L, (acc, v) -> acc + v)"
        )
        sig = F.floor(
            F.lit(float(LOGIT_P_SCALE))
            / (
                F.lit(1.0)
                + F.exp(-(z_num.cast("double") / F.lit(float(LOGIT_Z_DEN))))
            )
        ).cast("bigint")
        d = sig - F.col("y").cast("long") * F.lit(LOGIT_P_SCALE)
        # gradient: ONE pass over base. d is pinned to its OWN
        # projection before the explode — putting it in the same
        # select as posexplode makes the generator re-evaluate the
        # whole dot product + exp once per exploded slot (65× per
        # doc; measured 2.5 s vs 0.33 s per step at sf0.1). The
        # per-addend (code · d) product is long-safe (≤ 1024·10¹²)
        # and each addend is cast to DECIMAL(38,0) before the fold,
        # exactly the old sparse aggregate's addend set per feature;
        # map-side partials reduce every partition to ≤ 65 rows
        # before the only shuffle.
        g = (
            base.select(d.alias("d"), "codes")
            .select(F.posexplode(F.expr("transform(codes, c -> c * d)"))
                    .alias("feat", "g"))
            .groupBy("feat")
            .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
            .collect()
        )
        grad = {int(r["feat"]): int(r["g"] or 0) for r in g}
        w = {
            j: w[j]
            - _trunc_div(grad.get(j, 0), 2 * QC_SCALE * n_docs)
            - _trunc_div(w[j], 2000)
            for j in range(nf)
        }
    # base is a localCheckpoint — its backing RDD is released by the
    # ContextCleaner once this frame goes out of scope.
    return [(int(j), int(w[j])) for j in range(nf)]


def _logit_oracle() -> str:
    """quality_classifier_logit mirrored: the classifier feature/label
    CTEs, then LOGIT_ITERS × (exact-integer logit join → quantized σ →
    exact-integer gradient → truncating-integer update) chained CTEs."""
    from .text import ORACLE as _TEXT_ORACLE

    gopher = _TEXT_ORACLE["quality_gopher_rules"]
    p = LOGIT_P_SCALE
    ctes = [
        f"""toksq AS (
    SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
featsq AS (
    SELECT doc_id, {md5_hash60_sql("bg")} % {QC_BUCKETS} AS bucket
    FROM (
        SELECT doc_id,
               unnest([array_to_string(tk[i:i+1], ' ')
                       FOR i IN range(1, len(tk))]) AS bg
        FROM toksq WHERE len(tk) >= 2
    )
),
fq AS (SELECT doc_id, bucket, count(*) AS tf FROM featsq GROUP BY 1, 2),
ngq AS (SELECT doc_id, sum(tf) AS n_grams FROM fq GROUP BY 1),
codesq AS (
    SELECT doc_id, CAST(bucket AS INT) AS feat,
           CAST((tf * {QC_SCALE}) // n_grams AS BIGINT) AS code
    FROM fq JOIN ngq USING (doc_id)
    UNION ALL
    SELECT doc_id, {QC_BIAS} AS feat, {QC_SCALE} AS code FROM documents
),
lblq AS (
    SELECT doc_id, CASE WHEN {_QC_LABEL_SQL} THEN 1 ELSE 0 END AS y
    FROM ({gopher})
),
ndq AS (SELECT count(*)::BIGINT AS n FROM documents),
lw0 AS (
    SELECT CAST(unnest(range(0, {QC_BIAS + 1})) AS INT) AS feat,
           CAST(0 AS BIGINT) AS w
)"""
    ]
    for t in range(LOGIT_ITERS):
        ctes.append(
            f"""z{t} AS (
    SELECT c.doc_id, l.y,
           CAST(sum(CAST(c.code * w.w AS DECIMAL(38,0))) AS BIGINT) AS z_num
    FROM codesq c JOIN lw{t} w USING (feat) JOIN lblq l USING (doc_id)
    GROUP BY 1, 2
),
d{t} AS (
    SELECT doc_id,
           CAST(floor(CAST({p} AS DOUBLE) /
                (CAST(1 AS DOUBLE) +
                 exp(-(CAST(z_num AS DOUBLE) / CAST({LOGIT_Z_DEN} AS DOUBLE)))))
                AS BIGINT)
           - CAST(y AS BIGINT) * {p} AS d
    FROM z{t}
),
g{t} AS (
    -- the gradient stays DECIMAL(38,0): |g| can reach 1024·10¹²·n_docs,
    -- past int64 at n ≳ 9·10³ docs on a hot feature (ADVICE_r13) — the
    -- narrowing happens AFTER the division, where the quotient is the
    -- corpus-size-free per-step update (≤ 5·10¹¹)
    SELECT c.feat,
           sum(CAST(c.code * d.d AS DECIMAL(38,0))) AS g
    FROM codesq c JOIN d{t} d USING (doc_id)
    GROUP BY 1
),
lw{t + 1} AS (
    -- HUGEINT // is truncate-toward-zero like Spark's div (verified:
    -- -7::HUGEINT // 2 = -3); never escapes — the update casts back
    SELECT w.feat,
           CAST(w.w - (CAST(coalesce(g.g, 0) AS HUGEINT)
                       // (2 * {QC_SCALE} * nd.n))
                    - (w.w // 2000) AS BIGINT) AS w
    FROM lw{t} w LEFT JOIN g{t} g USING (feat) CROSS JOIN ndq nd
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT feat, w AS weight_e12 FROM lw{LOGIT_ITERS}"
    )


ORACLE["quality_classifier_logit"] = materialize_ctes(_logit_oracle())


def quality_classifier_logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic scoring step + train-set confusion row: every document
    scored by the trained logit weights and classified at the NATURAL
    logistic operating point — σ(z) ≥ ½ ⟺ z ≥ 0 — so unlike the ridge
    row's mean-threshold cut, scoring needs NO exp() at all: the
    emitted score is the exact integer logit numerator z_num =
    Σ code·w_e12 and the prediction is the pure integer comparison
    z_num ≥ 0. The entire operator is integer arithmetic on the fit
    row's emitted weights (the classifier-score composition pattern) —
    hash-stable by construction, and at 100 TB the scoring plan is one
    scan joining only the broadcast 65-row weight table.
    """
    wmap = dict(_logit_weight_rows(spark, sf_dir))

    from .text import quality_gopher_rules

    docs = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    f = (
        docs.select("doc_id", F.explode(word_ngrams(toks, 2)).alias("bg"))
        .select("doc_id", (md5_hash60(F.col("bg")) % QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ng = f.groupBy("doc_id").agg(F.sum("tf").alias("n_grams"))
    codes = f.join(ng, "doc_id").select(
        "doc_id",
        F.col("bucket").cast("int").alias("feat"),
        F.expr(f"(tf * {QC_SCALE}) div n_grams").cast("bigint").alias("code"),
    )
    wdf = spark.createDataFrame(
        [(int(k), int(v)) for k, v in sorted(wmap.items())],
        schema="feat int, w long",
    )
    dot = (
        codes.join(F.broadcast(wdf), "feat")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("code") * F.col("w")).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sprod")
        )
    )
    bias_term = QC_SCALE * wmap[QC_BIAS]
    labels = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.coalesce(_qc_label().cast("int"), F.lit(0)).alias("label")
    )
    return labels.join(dot, "doc_id", "left").select(
        "doc_id",
        "label",
        (F.coalesce("sprod", F.lit(0)) + F.lit(bias_term)).alias("z_num"),
        (
            (F.coalesce("sprod", F.lit(0)) + F.lit(bias_term)) >= 0
        ).cast("int").alias("predicted"),
    )


ORACLE["quality_classifier_logit_score"] = materialize_ctes(
    _logit_oracle().replace(
        f"\nSELECT feat, w AS weight_e12 FROM lw{LOGIT_ITERS}",
        f""",
wfitl AS (SELECT feat, w FROM lw{LOGIT_ITERS}),
dotl AS (
    SELECT c.doc_id,
           CAST(sum(CAST(c.code * w.w AS DECIMAL(38,0))) AS BIGINT) AS sprod
    FROM (SELECT doc_id, feat, code FROM codesq WHERE feat < {QC_BIAS}) c
    JOIN wfitl w USING (feat)
    GROUP BY 1
),
biasl AS (SELECT {QC_SCALE} * w AS b FROM wfitl WHERE feat = {QC_BIAS})
SELECT l.doc_id, l.y AS label,
       coalesce(d.sprod, 0) + b.b AS z_num,
       CASE WHEN coalesce(d.sprod, 0) + b.b >= 0 THEN 1 ELSE 0 END::INT
           AS predicted
FROM lblq l LEFT JOIN dotl d USING (doc_id) CROSS JOIN biasl b""",
    )
)


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "dsir_importance": dsir_importance,
    "quality_classifier_fit": quality_classifier_fit,
    "quality_classifier_score": quality_classifier_score,
    "quality_classifier_logit": quality_classifier_logit,
    "quality_classifier_logit_score": quality_classifier_logit_score,
    "term_pmi": term_pmi,
    "bm25_search": bm25_search,
    "doc_unigram_logprob": doc_unigram_logprob,
    "doc_bigram_surprisal": doc_bigram_surprisal,
    "doc_backoff_surprisal": doc_backoff_surprisal,
    "doc_perplexity_buckets": doc_perplexity_buckets,
    "phrase_search": phrase_search,
    "vocab_coverage": vocab_coverage,
}
