"""Text analysis for training-data pipelines (north-star extension;
nearest reference analogs: TokenCountMapper, RegexMapper, the streaming
text protocol).

All operators are pure Column expressions (whole-stage codegen, no UDFs)
and deterministic across engines, so every one is DuckDB-oracle-checkable.
Designed to run over a 100 TB ``documents`` table: every function is
row-local (no shuffle); only downstream aggregations shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_20_spark.functions import ensure_parallelism, let, md5_long, tokens

# A small English stopword list for the ratio heuristics (public-domain
# common-words list; the synthetic fixture text is built from similar
# high-frequency tokens).
STOPWORDS = (
    "the a an of to in and or is are was were for on with as by at from".split()
)


def token_count(col: Column | str) -> Column:
    """Whitespace token count — the BPE-ish budget proxy."""
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_token_len_t(t: Column) -> Column:
    """Mean token length over a pre-tokenized array (0 for empty docs)."""
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def avg_token_len(col: Column | str) -> Column:
    """Mean token length (0 for empty docs).  Token array let-bound once
    (lambda-CSE rule) — the _t builder references it several times."""
    return let(tokens(col), avg_token_len_t)


def distinct_token_ratio_t(t: Column) -> Column:
    return F.when(
        F.size(t) > 0, F.size(F.array_distinct(t)).cast("double") / F.size(t)
    ).otherwise(F.lit(1.0))


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: |distinct tokens| / |tokens| (1.0 for empty)."""
    return let(tokens(col), distinct_token_ratio_t)


def stopword_ratio_t(t: Column, stopwords: tuple[str, ...] = tuple(STOPWORDS)) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, n_stop.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = tuple(STOPWORDS)) -> Column:
    """Fraction of tokens that are stopwords — the core quality signal."""
    return let(tokens(col), lambda t: stopword_ratio_t(t, stopwords))


def quality_score_t(t: Column) -> Column:
    n = F.size(t)
    len_ok = F.when((n >= 10) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.25))
    div = distinct_token_ratio_t(t)
    sw = stopword_ratio_t(t)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok * 0.4 + div * 0.3 + sw_ok * 0.3), 6)


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards reasonable length,
    lexical diversity, and presence (not excess) of stopwords.  A
    deterministic stand-in for model-based quality filters; thresholds
    follow common heuristic-filter practice (e.g., Gopher rules)."""
    return let(tokens(col), quality_score_t)


# Function-word profiles for multi-class ID — tiny public-domain
# closed-class word lists (the signal real stopword/n-gram LID models
# use; swap in fuller profiles as data without code changes).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": tuple(STOPWORDS),
    "fr": tuple("le la les un une des et ou est sont dans pour sur avec de du au".split()),
    "de": tuple("der die das ein eine und oder ist sind in mit von zu auf für den".split()),
    "es": tuple("el la los las un una y o es son en con de del para por al".split()),
}


def lang_scores_t(
    t: Column,
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> list[tuple[str, Column]]:
    profs = profiles if profiles is not None else LANG_PROFILES
    return [(lang, stopword_ratio_t(t, tuple(words))) for lang, words in profs.items()]


def lang_scores(
    col: Column | str,
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> list[tuple[str, Column]]:
    """Per-language profile scores: fraction of tokens in each
    language's function-word list."""
    return lang_scores_t(tokens(col), profiles)


def lang_id_t(
    t: Column,
    profiles: dict[str, tuple[str, ...]] | None = None,
    min_score: float = 0.05,
) -> Column:
    profs = profiles if profiles is not None else {"en": tuple(STOPWORDS)}
    scored = lang_scores_t(t, profs)
    langs = [lang for lang, _ in scored]
    best = F.array_max(
        F.array(
            *[
                F.struct(s.alias("s"), F.lit(-i).alias("ni"))
                for i, (_, s) in enumerate(scored)
            ]
        )
    )
    name = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["ni"] + 1)
    return F.when(best["s"] >= min_score, name).otherwise(F.lit("unknown"))


def lang_id(
    col: Column | str,
    profiles: dict[str, tuple[str, ...]] | None = None,
    min_score: float = 0.05,
) -> Column:
    """Multi-class heuristic language ID: score the token stream against
    each language's function-word profile, take the argmax (ties broken
    by profile order — deterministic under any partitioning), emit
    ``unknown`` below ``min_score``.  Pure Column expressions, no UDF.

    Default single-profile call degenerates to en/unknown on the
    synthetic fixture corpus, whose text carries no language signal
    (every `lang` label shares one English-like token distribution) —
    the multi-profile discrimination is exercised by unit tests with
    profile-bearing text (`test_lang_id_multiclass`)."""
    return let(tokens(col), lambda t: lang_id_t(t, profiles, min_score))


def fingerprint_t(t: Column, ngram: int = 8) -> Column:
    n_sh = F.greatest(F.size(t) - ngram + 1, F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: md5_long(F.array_join(F.slice(t, i, ngram), " ")),
    )
    return F.array_min(sh)


def fingerprint(col: Column | str, ngram: int = 8) -> Column:
    """Document fingerprint: minimum md5-hash over word ``ngram``-shingles
    (winnowing-style rolling fingerprint, deterministic across engines).
    Docs shorter than ``ngram`` tokens hash the whole text."""
    return let(tokens(col), lambda t: fingerprint_t(t, ngram))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats table (all codegen'd, zero shuffle).
    ``ensure_parallelism`` spreads the CPU-heavy token passes across all
    cores when the input arrives as a single small split (no-op at scale).

    The token array is materialized ONCE in its own projection before the
    nine derived metrics: Catalyst does not CSE across nested higher-order
    lambdas, so inlining ``tokens(text)`` into every metric re-runs the
    regex split ~10× per row (and the shingle loop in ``fingerprint``
    re-tokenized per shingle).  CollapseProject's cheap-expression guard
    keeps the two projections separate.
    """
    t = F.col("_toks")
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            char_count(text_col).alias("n_chars_measured"),
            tokens(text_col).alias("_toks"),
        )
        .select(
            F.col(id_col),
            F.size(t).alias("n_tokens"),
            "n_chars_measured",
            F.round(avg_token_len_t(t), 6).alias("avg_token_len"),
            F.round(distinct_token_ratio_t(t), 6).alias("distinct_ratio"),
            F.round(stopword_ratio_t(t), 6).alias("stopword_ratio"),
            quality_score_t(t).alias("quality"),
            lang_id_t(t).alias("lang_pred"),
            fingerprint_t(t).alias("fingerprint"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    shard_col: str | None = None,
) -> DataFrame:
    """Pack documents into fixed token-budget context windows: order by
    ``id_col``, prefix-sum ``tokens_col``, ``bin_id = floor(preceding /
    budget)`` — contiguous packing, reproducible under any partitioning
    (vs. greedy first-fit whose output depends on arrival order).

    ``shard_col`` partitions the packing: each shard prefix-sums and
    bins independently — REQUIRED at scale, because a global prefix sum
    is one task (`Window.orderBy` with no partition key plans an
    Exchange SinglePartition).  Sharding matches how trainers consume
    the data anyway: one rank reads one shard, bins are rank-local.
    ``shard_col=None`` keeps the single global window for small inputs.

    Output: input columns + ``bin_id`` (within shard) + ``bin_offset``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col).orderBy(id_col)
        if shard_col is not None
        else Window.orderBy(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.withColumn("_cum", F.sum(tokens_col).over(w))
    preceding = F.col("_cum") - F.col(tokens_col)
    return (
        c.select(
            *df.columns,
            F.floor(preceding / budget).cast("long").alias("bin_id"),
            (preceding - F.floor(preceding / budget) * budget)
            .cast("long")
            .alias("bin_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window prep op for training/embedding pipelines.  Chunk i
    covers tokens ``[1 + i*stride, ... + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the final partial chunk is kept
    (dropping it silently loses tail text).  Pure Column expressions:
    tokenize once, explode a ``sequence`` of chunk starts, slice — all
    row-local (embarrassingly parallel; no shuffle).

    Output: (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    out = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            t.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
            ).alias("_chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        F.size("_chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(id) mod 10000 < rate*10000`` for its stratum's rate — the
    data-mixing op (e.g. upsample low-resource languages, downsample
    boilerplate).  md5-hash gating (InputSampler/MD5Filter discipline)
    makes the sample reproducible in any engine and stable under
    repartitioning, unlike seeded Bernoulli sampling."""
    rate = None
    for stratum, r in rates.items():
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    bucket = md5_long(F.col(id_col).cast("string")) % 10000
    return df.filter(bucket < (rate * 10000).cast("long"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm: Schleimer,
    Wilkerson & Aiken, SIGMOD'03): hash every word ``k``-gram
    (:func:`md5_long` — engine-portable), then keep the MINIMUM hash of
    each sliding ``window`` of consecutive k-gram hashes; the distinct
    minima are the document's fingerprints.

    Guarantees (the paper's): any shared substring of at least
    ``k + window - 1`` tokens produces at least one shared fingerprint,
    while storing only ~``2/(window+1)`` of all k-gram hashes — the
    position-aware fingerprint family, vs the position-blind MinHash
    sketch in ``dedup``.

    Scale: the whole selection is higher-order Column expressions
    (transform/slice/array_min — whole-stage codegen, row-local, zero
    shuffle); only the output explode widens rows.  Nearest reference
    analog: the per-record digesting idiom of core/io/MD5Hash.java, with
    windowed selection the reference never had.

    The token and k-gram-hash arrays MUST be materialized in separate
    projections (the chained ``select``s below) before the sliding-window
    ``transform``: Catalyst does not common-subexpression-eliminate
    across nested higher-order lambdas, so writing ``minima`` over an
    inline ``hashes`` expression re-tokenizes and re-hashes the document
    once per window position — O(n_tokens × window) tokenizations per
    row, measured ~60× slower at sf0.01 with identical output.
    CollapseProject's cheap-expression guard keeps these projections from
    being re-inlined."""
    toks_df = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    hashed = toks_df.select(
        id_col,
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0))
            ),
            lambda i: md5_long(
                F.array_join(F.slice(F.col("_toks"), i + 1, k), " ")
            ),
        ).alias("_h"),
    )
    h = F.col("_h")
    n_windows = F.greatest(F.size(h) - window + 1, F.lit(1))
    minima = F.transform(
        F.sequence(F.lit(1), n_windows),
        # slice clamps at the array end, so short docs yield min-of-all
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(minima)).alias("fp")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    boundary_bits: int = 3,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS trick, token granularity):
    a chunk boundary falls AFTER any token whose md5 hash has its low
    ``boundary_bits`` bits zero — so boundaries are decided by content,
    not position, and an insertion near the start of a document shifts
    only the chunk it lands in, never the chunks downstream (fixed-width
    chunking re-hashes everything after the edit).  Expected chunk
    length is ``2**boundary_bits`` tokens.

    Emits ``(id, chunk_idx, chunk_hash, n_tokens)`` — the chunk-store
    view used for delta-dedup between document versions: shared chunks
    hash identically across docs.

    Scale: boundary detection, range assembly, and hashing are all
    higher-order Column expressions (codegen, row-local, zero shuffle);
    only the final explode widens rows.  Reference analog: the
    block-level dedup HDFS never had; per-record digests via
    core/io/MD5Hash.java.

    The token array and the boundary-position array are each materialized
    in their own projection before the expressions that consume them
    repeatedly: Catalyst does not CSE across nested higher-order lambdas,
    so inlining ``tokens(text)`` into the boundary filter re-tokenized the
    document once per token, and ``bpos`` referenced from both ``starts``
    and ``ends`` hashed every token twice.  CollapseProject's
    cheap-expression guard keeps the projections separate."""
    mask = (1 << boundary_bits) - 1
    toks = F.col("_toks")
    n = F.size(toks)
    tdf = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).filter(n >= 1)
    bdf = tdf.select(
        id_col,
        "_toks",
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: md5_long(F.element_at(toks, i)).bitwiseAND(mask) == 0,
        ).alias("_bpos"),
    )
    bpos = F.col("_bpos")
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(n))
    ranges = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        # a boundary on the last token leaves an empty trailing range
        lambda r: r["s"] <= r["e"],
    )
    chunks = F.transform(
        ranges,
        lambda r: F.struct(
            F.md5(
                F.array_join(F.slice(toks, r["s"], r["e"] - r["s"] + 1), " ")
            ).alias("h"),
            (r["e"] - r["s"] + 1).alias("nt"),
        ),
    )
    return (
        bdf.select(F.col(id_col), F.posexplode(chunks).alias("pos", "c"))
        .select(
            id_col,
            (F.col("pos") + 1).alias("chunk_idx"),
            F.col("c.h").alias("chunk_hash"),
            F.col("c.nt").alias("n_tokens"),
        )
    )


# --- unicode normalization head (curation step 0) ---------------------------

# Control chars (minus \t\n\r), DEL, zero-width space/joiners, BOM — the
# characters a corpus pass strips before anything else hashes or gates.
# Kept as ONE class so the Spark (Java regex) and oracle (RE2) spellings
# provably cover the same code points.
_CTRL_ZW_JAVA = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u200B-\\u200D\\uFEFF]"
_CTRL_ZW_RE2 = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]"

# Mojibake signature: UTF-8 bytes decoded as Latin-1 turn every
# non-ASCII char into a pair starting with Ã (U+00C3) or Â (U+00C2) —
# counting those lead bytes is the standard cheap detector.
_MOJIBAKE_CLASS = "[ÃÂ]"


def nfc_normalize_udf():
    """Arrow-batched NFC normalization.  Spark SQL has no unicode
    normalization built-in (the ONE genuinely inexpressible step in the
    curation head), so this is the documented Pandas-UDF exception.
    The kernel is Python ``unicodedata.normalize`` behind an
    ``str.isascii()`` fast path — ASCII rows (the overwhelming majority
    of a real corpus, and 100% of the fixture) short-circuit at C
    speed, so the per-row Python cost is paid only where normalization
    can matter.  (pyarrow's ``utf8_normalize`` would be the vectorized
    choice, but the container's build returns DECOMPOSED output for
    form='NFC' — verified broken, composed 'café' comes back 5 code
    points — so unicodedata, which matches DuckDB's ``nfc_normalize``
    codepoint-for-codepoint, is the correct kernel.)"""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        def one(x):
            if x.isascii():
                return x
            return unicodedata.normalize("NFC", x)

        return s.map(one, na_action="ignore")

    return _nfc


def mojibake_hits(col: Column | str) -> Column:
    """Count of UTF-8-decoded-as-Latin-1 signature lead chars (Ã/Â) in
    the ORIGINAL text — detection only; repairing mojibake is a
    re-decode decision a pipeline makes upstream, not a string edit."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, _MOJIBAKE_CLASS, ""))


def normalize_text(
    df: DataFrame,
    text_col: str,
    *,
    out_col: str = "text_norm",
    mojibake_col: str = "mojibake_hits",
) -> DataFrame:
    """The curation head every real corpus pass runs BEFORE quality
    gating, dedup and splitting: NFC unicode normalization (composes
    combining sequences so 'café' hashes one way, not two), control /
    zero-width char strip, whitespace collapse + trim, and a mojibake
    hit count on the original text.  Everything except NFC is row-local
    Column codegen; NFC rides one Arrow-vectorized batch UDF (see
    :func:`nfc_normalize_udf`).

    Pipeline order matters: normalize → quality gate → dedup → split;
    hashing un-normalized text lets the same paragraph slip dedup under
    two unicode spellings, and gating before stripping zero-width chars
    miscounts lengths.

    Reference anchor: contrib/streaming's byte-level text protocol
    (``streaming/PipeMapper.java``) is where the reference normalized
    encodings; Unicode normalization itself is new surface."""
    nfc = nfc_normalize_udf()
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(nfc(F.col(text_col)), _CTRL_ZW_JAVA, ""),
            r"\s+",
            " ",
        )
    )
    return df.withColumn(mojibake_col, mojibake_hits(text_col)).withColumn(
        out_col, cleaned
    )
