"""Deduplication operators over documents (SURVEY §2 D1-D4).

Exact dedup and n-gram Jaccard carry DuckDB oracles; MinHash-LSH and
SimHash are sketch-based (our deterministic hash family) → rows-only gate
plus planted-duplicate pytest coverage.

Scale shape: every variant is candidate-generation (cheap, bucketed,
uniform shuffle keys) → exact verify (only on candidates). No cross join,
no driver collect; LSH band keys are prefixed with the band index so one
hot bucket value can't skew a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import (
    band_keys,
    md5_fingerprint,
    normalize_text,
    word_ngrams,
    ws_tokens,
)

ORACLE: dict[str, str] = {}

SHINGLE_N = 3
NUM_PERM = 64
LSH_BANDS = 16
LSH_ROWS = 4  # bands * rows == num_perm
MINHASH_TAU = 0.5
JACCARD_TAU = 0.08
#: document-frequency cap on shingle postings before the pair self-join.
#: A shingle appearing in d docs contributes d*(d-1)/2 candidate rows — one
#: boilerplate shingle (page header, license blurb) with df=10^6 would emit
#: 5*10^11 pairs. Shingles that common carry no near-dup signal (CCNet /
#: Lee et al. dedup practice), so they are dropped from the INTERSECTION
#: while full gram counts still feed the union/containment denominators.
SHINGLE_DF_CAP = 1000

_DUCK_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _spread(docs: DataFrame) -> DataFrame:
    """Ensure the CPU-bound signature stage uses every core WITHOUT ever
    shuffling a corpus that is already well-partitioned: locally a small
    parquet file scans in one task, so fan it out; at cluster scale the
    input arrives in thousands of scan partitions and this is a no-op
    (an unconditional repartition here would shuffle raw text — the
    most expensive possible shuffle at 100 TB)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


# ------------------------------------------------------------------ D1
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(normalized text) → group size + keeper id.

    The canonical 100 TB shape: one hash-shuffle on a 16-byte key; the
    keeper (min doc_id) replaces the reference pattern of rewriting one
    retained file per SDFS key-group.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", md5_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


ORACLE["dedup_exact"] = f"""
SELECT md5({_DUCK_NORM}) AS fp,
       count(*)          AS n_docs,
       min(doc_id)       AS keep_doc_id
FROM documents
GROUP BY 1
"""


CONTAIN_TAU = 0.5


def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs: C(A→B) = |A∩B| / |A| ≥ τ —
    catches documents swallowed by a larger one, which symmetric Jaccard
    misses (a quote inside a long page scores low J but high C).

    Same inverted-index self-join as Jaccard (shared df-capped shingle
    postings); emits the ordered pair once with containment in both
    directions.
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("grams").alias("n_grams")).where(F.col("n_grams") > 0)
    posting = _capped_posting(sh)
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    c_ab = F.round(F.col("n_inter") / F.col("na"), 6)
    c_ba = F.round(F.col("n_inter") / F.col("nb"), 6)
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_inter", c_ab.alias("contain_ab"), c_ba.alias("contain_ba"))
        .where((F.col("contain_ab") >= CONTAIN_TAU) | (F.col("contain_ba") >= CONTAIN_TAU))
    )


# ------------------------------------------------------------------ D4
def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_distinct(
            word_ngrams(ws_tokens(normalize_text(F.col("text"))), SHINGLE_N)
        ).alias("grams"),
    )


def _capped_posting(sh: DataFrame) -> DataFrame:
    """Exploded (doc_id, gram) postings with hot shingles removed.

    groupBy(gram) is skew-proof (map-side partial counts); the join back
    keeps only grams with df ≤ SHINGLE_DF_CAP, so the downstream
    self-join's worst bucket is CAP² rows instead of unbounded.
    """
    posting = sh.select("doc_id", F.explode("grams").alias("gram"))
    rare = (
        posting.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gram_df"))
        .where(F.col("gram_df") <= SHINGLE_DF_CAP)
        .select("gram")
    )
    return posting.join(rare, "gram").select("doc_id", "gram")


#: SQL mirror of _capped_posting (expects a CTE named `posting`)
_DUCK_CAPPED = f"""
    SELECT doc_id, gram FROM (
        SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS gram_df
        FROM posting
    ) WHERE gram_df <= {SHINGLE_DF_CAP}
"""


_DUCK_SHINGLES = f"""
    SELECT doc_id,
           list_distinct([
               array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
               FOR i IN range(1, len(toks) - {SHINGLE_N - 2})
           ]) AS grams
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex({_DUCK_NORM}, '\\s+'), t -> length(t) > 0) AS toks
        FROM documents
    )
    WHERE len(toks) >= {SHINGLE_N}
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the verify-stage primitive).

    Inverted-index self-join on df-capped shingle postings (never a cross
    join): pairs only materialize for docs sharing ≥1 rare shingle, then
    J = |∩| / |∪| ≥ τ.
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("grams").alias("n_grams")).where(F.col("n_grams") > 0)
    posting = _capped_posting(sh)
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


ORACLE["ngram_jaccard_pairs"] = f"""
WITH shingles AS ({_DUCK_SHINGLES}),
posting AS (
    SELECT doc_id, unnest(grams) AS gram FROM shingles
),
capped AS ({_DUCK_CAPPED}),
sizes AS (
    SELECT doc_id, len(grams) AS n_grams FROM shingles WHERE len(grams) > 0
),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM capped a JOIN capped b
      ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 6) >= {JACCARD_TAU}
"""


# ------------------------------------------------------------------ D2
def minhash_signatures(docs: DataFrame, seed: int = 42) -> DataFrame:
    """doc_id + MinHash signature over word shingles (JVM-side, no UDF).

    Shape matters: explode shingles once, hash each ONCE, then take the
    64 permutation minima as groupBy aggregates. (A pure column-expression
    formulation inlines the shingle pipeline into all 64 permutations —
    Catalyst's projection collapse recomputes regex+ngrams 64× per row,
    ~300× slower at sf0.1.) The shuffle carries only partial minima per
    doc thanks to map-side combine.
    """
    from ..functions import MINHASH_P, hash_param

    docs = _spread(docs)
    # shingle hashes without building gram strings: hash each token once,
    # then fold SHINGLE_N consecutive 31-bit-reduced hashes arithmetically
    # (string-concat shingling spent ~half the operator's time allocating)
    toks = docs.select(
        "doc_id",
        F.transform(
            ws_tokens(normalize_text(F.col("text"))),
            lambda t: F.pmod(F.xxhash64(t, F.lit(seed)), F.lit(MINHASH_P)),
        ).alias("th"),
    )
    mult = 1_000_003  # < 2^31, so acc*mult + h stays under 2^62 (ANSI-safe)

    def _gram_at(i):
        g = F.element_at(F.col("th"), i + 1)
        for k in range(1, SHINGLE_N):
            g = (g * F.lit(mult) + F.element_at(F.col("th"), i + 1 + k)) % F.lit(MINHASH_P)
        return g

    gram_hashes = F.when(
        F.size("th") >= SHINGLE_N,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size("th") - SHINGLE_N), _gram_at)
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # per-row array_min over each permutation: identical arithmetic to an
    # explode + 64-min groupBy but with NO shuffle at all — the signature
    # stage stays a narrow map (measured ~25% faster at sf0.1, and at
    # cluster scale it removes an O(total_shingles) network hop)
    gh = toks.select("doc_id", gram_hashes.alias("gh"))
    mins = []
    for i in range(NUM_PERM):
        a = (hash_param(seed, 2 * i) | 1) % MINHASH_P
        b = hash_param(seed, 2 * i + 1) % MINHASH_P
        mins.append(
            F.coalesce(
                F.array_min(
                    F.transform("gh", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
                ),
                F.lit(MINHASH_P),
            ).alias(f"s{i}")
        )
    return gh.select("doc_id", F.array(*mins).alias("sig"))


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs (the 100 TB dedup path).

    shingle → 64-perm signature → 16×4 band buckets → bucket self-join →
    signature-similarity verify ≥ τ. Candidate generation touches only
    (doc, band) rows — O(n·bands) shuffle, versus O(pairs) for the exact
    variant. rows-only gate (hash family is ours); recall covered by
    planted-duplicate tests against ngram_jaccard_pairs.
    """
    # the signature pipeline is consumed three times (bands, sig_a,
    # sig_b) and its lambda expressions defeat ReuseExchange
    # canonicalization — persist so it computes once. Signatures are
    # compact (64 longs/doc, ~0.5 KB) and MEMORY_AND_DISK spills rather
    # than OOMs at corpus scale; LRU eviction reclaims it afterwards.
    from pyspark.storagelevel import StorageLevel

    sigs = minhash_signatures(table(spark, sf_dir, "documents")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs.count()  # materialize before fan-out
    banded = sigs.select(
        "doc_id", F.explode(band_keys(F.col("sig"), LSH_BANDS, LSH_ROWS)).alias("bk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    # candidate pairs carry only ids through the band join + distinct;
    # the 64-long signatures rejoin afterwards (a doc colliding in k bands
    # would otherwise drag k copies of both signatures through the shuffle)
    cands = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(NUM_PERM)),
        6,
    )
    return (
        cands.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= MINHASH_TAU)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ------------------------------------------------------------------ D3
SIMHASH_BITS = 56
SIMHASH_BANDS = 4
SIMHASH_HAMMING = 3


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """56-bit SimHash per doc from token-frequency-weighted bit votes.

    explode → one groupBy(doc) with 56 conditional sums — all inside
    whole-stage codegen. The shuffle this plans is doc-sized, not
    token-sized: a doc's exploded rows stay in their scan partition, so
    the map-side partial aggregate collapses them to 56 longs per doc
    before any data moves (a per-row F.aggregate fold avoids even that,
    but higher-order functions are CodegenFallback — measured ~35%
    slower than the codegen'd aggregate at sf0.1). 56 bits keeps every
    shiftleft inside a signed 64-bit long.
    """
    docs = _spread(docs)
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(normalize_text(F.col("text")))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    bits = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return bits.select("doc_id", sim.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 4×14-bit band blocking, then exact hamming
    ≤ 3 verify via bit_count(xor). rows-only gate + planted-dup tests."""
    sigs = simhash_signatures(table(spark, sf_dir, "documents"))
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_width) - 1
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        F.shiftright("simhash", i * band_width)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= SIMHASH_HAMMING)
    )


ORACLE["ngram_containment_pairs"] = f"""
WITH shingles AS ({_DUCK_SHINGLES}),
posting AS (
    SELECT doc_id, unnest(grams) AS gram FROM shingles
),
capped AS ({_DUCK_CAPPED}),
sizes AS (
    SELECT doc_id, len(grams) AS n_grams FROM shingles WHERE len(grams) > 0
),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM capped a JOIN capped b
      ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       round(n_inter / sa.n_grams, 6) AS contain_ab,
       round(n_inter / sb.n_grams, 6) AS contain_ba
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE round(n_inter / sa.n_grams, 6) >= {CONTAIN_TAU}
   OR round(n_inter / sb.n_grams, 6) >= {CONTAIN_TAU}
"""

# ------------------------------------------------------------------ D31
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level fuzzy-match join: supplier-name pairs at edit distance
    exactly 1 — the entity-resolution primitive (record dedup where a
    code/name drifts by one character).

    Blocking is the character-level deletion neighborhood (FastSS, Bocek
    et al. 2007): each name emits itself plus one key per dropped char;
    any two strings within edit distance 1 share ≥1 key (substitution →
    same-position deletions match; insert/delete → the shorter string IS
    a deletion of the longer). Candidates are near-identical by
    construction, so levenshtein only verifies true near-misses — no
    block ever approaches the quadratic cross join, and key volume is
    len+1 rows per name through one equi-join shuffle. (Word-level and
    prefix blocking both degenerate on short names: with 2-word part
    names a dropped word leaves a single shared token and ~2.5k-row
    blocks — measured minutes, not seconds, at sf0.1.)
    """
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.lower(F.col("s_name")).alias("name")
    )
    keyed = sup.select(
        "s_suppkey",
        "name",
        F.explode_outer(
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.length("name")),
                    lambda i: F.concat(
                        F.col("name").substr(F.lit(1), i - 1),
                        F.col("name").substr(i + 1, F.length("name")),
                    ),
                ),
                F.array(F.col("name")),
            )
        ).alias("blk"),
    ).where(F.col("blk").isNotNull())
    a, b = keyed.alias("a"), keyed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("a.name").alias("name_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") == 1)
        .select("supp_a", "supp_b", "dist")
    )


ORACLE["fuzzy_name_pairs"] = """
WITH named AS (
    SELECT s_suppkey, lower(s_name) AS name FROM supplier
),
keyed AS (
    SELECT s_suppkey, name,
           unnest(list_append([
               substring(name, 1, i - 1) || substring(name, i + 1, length(name))
               FOR i IN range(1, length(name) + 1)
           ], name)) AS blk
    FROM named
),
cands AS (
    SELECT DISTINCT a.s_suppkey AS supp_a, a.name AS name_a,
                    b.s_suppkey AS supp_b, b.name AS name_b
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.s_suppkey < b.s_suppkey
)
SELECT supp_a, supp_b, levenshtein(name_a, name_b) AS dist
FROM cands
WHERE levenshtein(name_a, name_b) = 1
"""


# ------------------------------------------------------------------ D39
SPAN_W = 8


def dup_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplicate detection: every 8-token span occurring
    in ≥2 documents, with its document frequency and total occurrences —
    the cross-document substring-duplication report behind exact-substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    Better": repeated spans, not just whole docs, drive memorization).

    One explode + one hash aggregate on the span fingerprint: partial
    (map-side) counts make the hot boilerplate span — the exact row this
    query exists to find — a cheap skewed KEY, never a skewed TASK. The
    16-byte md5 replaces the raw span text in the shuffle.
    """
    docs = table(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id",
        F.explode(
            word_ngrams(ws_tokens(normalize_text(F.col("text"))), SPAN_W)
        ).alias("span"),
    ).select("doc_id", F.md5("span").alias("span_fp"))
    return (
        spans.groupBy("span_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occur"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


ORACLE["dup_span_docs"] = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex({_DUCK_NORM}, '\\s+'),
                       t -> length(t) > 0) AS toks
    FROM documents
),
spans AS (
    SELECT doc_id,
           md5(array_to_string(toks[i:i+{SPAN_W - 1}], ' ')) AS span_fp
    FROM (
        SELECT doc_id, toks, unnest(range(1, len(toks) - {SPAN_W - 2})) AS i
        FROM toks WHERE len(toks) >= {SPAN_W}
    )
)
SELECT span_fp,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occur,
       min(doc_id) AS first_doc
FROM spans
GROUP BY span_fp
HAVING count(DISTINCT doc_id) >= 2
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dup_span_docs": dup_span_docs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ngram_containment_pairs": ngram_containment_pairs,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "fuzzy_name_pairs": fuzzy_name_pairs,
}
