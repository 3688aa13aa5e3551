"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

No reference counterpart (BASELINE north-star extensions); designed like
the rest of the inventory: pure ``pyspark.sql.functions`` expressions
(whole-stage codegen, no UDFs) so they stream over a 100 TB documents
table with zero Python overhead, each with a DuckDB oracle twin.

Determinism notes: only +,-,*,/ and string ops — no transcendentals
(libm results differ across engines in the last ulp). Marker-word counts
use the length-difference idiom, which both engines implement with the
same left-to-right non-overlapping replace semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
    load_table,
    spread_small,
)


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a space-delimited word via the length-diff idiom
    (identical semantics in Spark and ANSI SQL engines)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def normalized_text(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 over whitespace-normalized
    lowercase text — the exact-dedup key that survives reformatting."""
    return F.md5(normalized_text(text))


@query(
    "tx1_token_count",
    oracle=r"""
    SELECT doc_id, lang,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def tx1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — the unit every downstream
    budget (dedup shingles, quality, cost estimates) is denominated in."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "tx2_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             length(replace(text, ' ', '')) AS n_letter_chars,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS n_the,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' a ', ''))) // 3 AS n_a
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_letter_chars AS DOUBLE) / NULLIF(n_tokens, 0) AS avg_token_len,
           CAST(n_the + n_a AS DOUBLE) / NULLIF(n_tokens, 0) AS stopword_ratio,
           0.5 * (CAST(n_the + n_a AS DOUBLE) / NULLIF(n_tokens, 0))
             + 0.3 * least(CAST(n_letter_chars AS DOUBLE) / NULLIF(n_tokens, 0) / 8.0, 1.0)
             + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS quality_score
    FROM t
    """,
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: token stats + stopword density combined
    with rational arithmetic only (reproducible across engines/runs)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = token_count(text)
    n_letters = F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_stop = word_occurrences(text, "the") + word_occurrences(text, "a")
    nt = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    avg_len = n_letters.cast("double") / nt
    stop_ratio = n_stop.cast("double") / nt
    score = (
        0.5 * stop_ratio
        + 0.3 * F.least(avg_len / 8.0, F.lit(1.0))
        + 0.2 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# marker words per language for the n-gram/stopword language-ID heuristic
_LANG_MARKERS = [("en", "the"), ("de", "der"), ("fr", "le"), ("es", "el")]


@query(
    "tx3_language_guess",
    oracle="""
    WITH m AS (
      SELECT doc_id, lang,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS c_en,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' der ', ''))) // 5 AS c_de,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' le ', ''))) // 4 AS c_fr,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' el ', ''))) // 4 AS c_es
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END AS lang_guess
    FROM m
    """,
)
def tx3_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language marker-word counts
    with a fixed priority tie-break. (The synthetic corpus shares one
    vocabulary across langs, so accuracy is meaningless here — the gate
    checks engine parity of the heuristic itself.)"""
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        lang: word_occurrences(F.col("text"), w) for lang, w in _LANG_MARKERS
    }
    c = counts
    guess = (
        F.when(
            (c["en"] >= c["de"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["es"]), "en"
        )
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["es"]), "de")
        .when(c["fr"] >= c["es"], "fr")
        .otherwise("es")
    )
    return docs.select("doc_id", "lang", guess.alias("lang_guess"))


CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap


@query(
    "tx5_chunk_documents",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS INT) AS chunk_id,
           array_to_string(list_slice(words, s + 1, s + {CHUNK_TOKENS}), ' ')
               AS chunk_text,
           least({CHUNK_TOKENS}, len(words) - s) AS n_tokens
    FROM w, unnest(range(0, len(words), {CHUNK_STRIDE})) t(s)
    """,
)
def tx5_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines: fixed-size token windows
    ({CHUNK_TOKENS} tokens, stride {CHUNK_STRIDE} = 10-token overlap).
    Pure array ops — split once, explode chunk starts, slice — so the
    plan is a partition-preserving projection + explode (no shuffle) and
    streams over a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    words = F.split(F.trim(F.col("text")), r"\s+")
    with_words = docs.select("doc_id", words.alias("words"))
    starts = F.sequence(
        F.lit(0), F.size("words") - 1, F.lit(CHUNK_STRIDE)
    )
    exploded = with_words.select(
        "doc_id", "words", F.explode(starts).alias("s")
    )
    return exploded.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("words"), F.col("s") + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_TOKENS), F.size("words") - F.col("s")
        ).alias("n_tokens"),
    )


@query(
    "tx4_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 of normalized text (identical hex in
    any engine — the portable dedup key)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    )


@query(
    "px1_corpus_curation",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, lang,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             length(replace(text, ' ', '')) AS n_letter_chars,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS n_the,
             (length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' a ', ''))) // 3 AS n_a
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang, fp, n_tokens,
             0.5 * (CAST(n_the + n_a AS DOUBLE) / NULLIF(n_tokens, 0))
               + 0.3 * least(CAST(n_letter_chars AS DOUBLE)
                             / NULLIF(n_tokens, 0) / 8.0, 1.0)
               + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS score
      FROM scored
    ),
    canon AS (SELECT fp, MIN(doc_id) AS canon_id FROM q GROUP BY fp),
    flagged AS (
      SELECT q.lang, q.n_tokens,
             (q.doc_id = c.canon_id) AS is_canonical,
             (q.doc_id = c.canon_id AND q.score >= 0.3 AND q.n_tokens >= 20)
                 AS keep
      FROM q JOIN canon c ON q.fp = c.fp
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
               AS n_canonical,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_kept
    FROM flagged GROUP BY lang
    """,
)
def px1_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation report — the composition a training-data
    pipeline actually runs: exact dedup (fingerprint -> canonical doc) +
    quality gate (tx2's score >= 0.3) + length gate (>= 20 tokens),
    rolled up per language with the retained token budget.

    Two shuffles total at any scale: one groupBy on the fingerprint
    (canonical election), one on lang (the report). The quality score is
    rational-arithmetic only, so the keep/drop decision is bit-identical
    across engines — the property that makes a 100 TB curation run
    reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = token_count(text)
    n_letters = F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_stop = word_occurrences(text, "the") + word_occurrences(text, "a")
    nt = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    score = (
        0.5 * (n_stop.cast("double") / nt)
        + 0.3 * F.least(n_letters.cast("double") / nt / 8.0, F.lit(1.0))
        + 0.2 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    )
    scored = docs.select(
        "doc_id",
        "lang",
        fingerprint(text).alias("fp"),
        n_tokens.alias("n_tokens"),
        score.alias("score"),
    )
    canon = scored.groupBy("fp").agg(F.min("doc_id").alias("canon_id"))
    flagged = scored.join(canon, "fp").select(
        "lang",
        "n_tokens",
        (F.col("doc_id") == F.col("canon_id")).alias("is_canonical"),
        (
            (F.col("doc_id") == F.col("canon_id"))
            & (F.col("score") >= 0.3)
            & (F.col("n_tokens") >= 20)
        ).alias("keep"),
    )
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("is_canonical"), 1).otherwise(0)).alias("n_canonical"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).alias(
            "tokens_kept"
        ),
    )


# GPT-style pre-tokenizer classes, ASCII form: letter runs, digit runs,
# single punctuation marks. Identical regex semantics in Spark (Java
# regex) and DuckDB (RE2) for this class-only pattern.
_BPE_PRETOKEN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "tx6_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PRETOKEN}')) AS INT)
               AS n_bpe_tokens,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END
               AS n_ws_tokens
    FROM documents
    """,
)
def tx6_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-style pre-tokenizer regex (letter
    runs | digit runs | punctuation) next to the whitespace count — the
    two units a data pipeline budgets in (cost estimates track the BPE
    side; dedup shingles track the whitespace side). Pure regexp, stays
    in codegen."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


@query(
    "tx7_vocab_topk",
    oracle=r"""
    WITH tok AS (
      SELECT lower(unnest(string_split_regex(trim(text), '\s+'))) AS word
      FROM documents WHERE length(trim(text)) > 0
    ),
    counts AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word)
    SELECT word, n, CAST(rnk AS INT) AS rank
    FROM (
      SELECT word, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk
      FROM counts
    ) WHERE rnk <= 100
    """,
)
def tx7_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics: global top-100 words by frequency — the
    first step of tokenizer/vocab training. explode -> one
    map-side-combinable groupBy -> global top-k; Catalyst plans the final
    ordering as TakeOrderedAndProject (no full sort) since the count
    table is already reduced to distinct words."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    counts = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
    )


@query(
    "tx10_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS term
      FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (
      SELECT COUNT(*) AS n_docs FROM documents WHERE length(trim(text)) > 0
    ),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / dfreq.df
                 AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n)
                        / dfreq.df DESC,
                        tf.term
             ) AS rnk
      FROM tf JOIN dfreq USING (term)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           tfidf, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 3
    """,
)
def tx10_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf with a LINEAR idf (tf * N/df):
    the classic keyword-extraction signal without transcendentals — N/df
    is monotone in 1/df, so the RANKING equals log-idf's, and the score
    stays a single exact-integer product followed by one IEEE division
    (bit-identical across engines; the determinism contract bans ln()).

    Shape at scale (r11 rewrite, guide §2.4/§3): explode -> (doc, term)
    counts (map-side combinable) -> doc frequency as COUNT() OVER
    (PARTITION BY term) on the same tf frame — tf has exactly one row
    per (doc, term), so the window count IS the doc frequency. The
    previous join-against-dfreq shape computed the whole explode+count
    subtree TWICE (Catalyst planned no exchange reuse across the join's
    sides) and broadcast a VOCABULARY-sized frame — a 100 TB corpus'
    vocabulary is not broadcast-safe. Now: one explode pass, no
    broadcast, and the per-doc top-3 still plans as partial+final
    WindowGroupLimit (top-k pushed below the doc_id exchange). The only
    driver-side value is the corpus count scalar."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    n_docs = docs.count()  # one scalar; distributed count
    tok = (
        spread_small(docs)
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .select("doc_id", F.lower(F.col("w")).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = F.count("*").over(Window.partitionBy("term"))
    tfidf = (
        F.col("tf").cast("double") * F.lit(n_docs).cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tf.withColumn("df", dfreq)
        .withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


@query(
    "tx11_repetition_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
      FROM (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
               unnest(range(greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 0))) AS i
        FROM documents
      )
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_grams3,
           CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt) AS dup3_fraction,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top3_fraction
    FROM c GROUP BY doc_id
    """,
)
def tx11_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition signals (the Gopher quality rules'
    repetition family): per doc, the fraction of word-3-gram instances
    whose gram repeats inside the document and the share taken by the
    single most frequent 3-gram — template spam and degenerate
    generations score high on both, natural text scores low. One
    explode -> per-(doc,gram) count -> per-doc aggregate: two shuffles,
    both keyed on doc_id(+gram), map-side combinable. Integer counts
    with one final double division — exact in any engine."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.dedup import (
        gram_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r11: shuffle-free array-level gram build (multiplicity preserved)
    # — the lead()-window form paid a token-stream Exchange+Sort here
    grams = gram_rows(docs, 3, out_col="gram")
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    n = F.sum("cnt")
    dup = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
    return per_gram.groupBy("doc_id").agg(
        n.alias("n_grams3"),
        (dup.cast("double") / n).alias("dup3_fraction"),
        (F.max("cnt").cast("double") / n).alias("top3_fraction"),
    )


def _px9_oracle() -> str:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
        ORACLES,
    )

    return f"""
    WITH q AS ({ORACLES["tx2_quality_score"]})
    SELECT doc_id, quality_score,
           CAST(NTILE(4) OVER (ORDER BY quality_score DESC, doc_id)
                AS BIGINT) AS curriculum_stage
    FROM q
    """


@query("px9_quality_curriculum", oracle=_px9_oracle())
def px9_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM staging for quality-ordered training: exact quartile
    assignment over the tx2 quality score (stage 1 = highest-quality
    quarter), the standard recipe for quality-staged / annealed data
    ordering. The SCALE-SAFE shape from the start — a bare
    ``NTILE() OVER (ORDER BY ...)`` would single-partition the corpus
    (the d25 lesson), so this ranks via range-repartition +
    per-partition row numbers + driver prefix offsets
    (``functions/ranking.with_global_rank``) and derives the bucket
    with literal arithmetic (``ntile_from_rank``). Every stage is
    parallel; the driver sees only partition counts. The oracle is the
    plain NTILE(4) — proving the distributed formula matches the
    engine builtin bit-for-bit."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.ranking import (
        ntile_from_rank,
        with_global_rank_n,
    )

    q = tx2_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    # n from the rank pass's partition sizes (r11): the previous
    # separate q.count() re-ran the whole tx2 scoring scan
    ranked, n = with_global_rank_n(
        q,
        [F.col("quality_score").desc(), F.col("doc_id")],
        rank_col="_grk",
    )
    return ranked.select(
        "doc_id",
        "quality_score",
        ntile_from_rank(F.col("_grk"), n, 4).alias("curriculum_stage"),
    )
