"""Text analysis for large-scale corpus pipelines — all JVM-side exprs.

Every function returns a Column (or a DataFrame transform) built from
pyspark.sql.functions only: no Python UDFs, so the whole family stays
inside whole-stage codegen and scales linearly with executors.

Reference parity: getl ships string utils (StringUtils.groovy) but no
corpus analytics; these are the "beyond the reference" operators for
training-data prep (language-ID, quality scoring, token counting,
fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A small, fixed stopword list used by quality scoring. Deliberately
# tiny + deterministic: this is a heuristic feature, not NLP.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

_LANG_MARKERS = [
    ("zh", r"[一-鿿]"),
    ("ru", r"[Ѐ-ӿ]"),
    ("de", r"\b(der|die|das|und|nicht)\b"),
    ("fr", r"\b(le|la|les|est|une)\b"),
    ("es", r"\b(el|los|las|una|es)\b"),
    ("en", r"\b(the|is|are|was|of)\b"),
]


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col) -> Column:
    """BPE-style subword proxy: word pieces + digits + punctuation as
    separate tokens (regex segmentation, GPT-2-ish)."""
    seg = F.regexp_replace(col, r"([\p{Punct}])", r" $1 ")
    seg = F.regexp_replace(seg, r"(\d)", r" $1 ")
    return F.when(F.length(F.trim(seg)) == 0, F.lit(0)).otherwise(F.size(tokens(seg)))


def stopword_ratio(col, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    toks = tokens(F.lower(col))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(n_stop / F.size(toks))


def punct_ratio(col) -> Column:
    stripped = F.regexp_replace(col, r"[\p{Punct}]", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - F.length(stripped)) / F.length(col)
    )


def mean_word_length(col) -> Column:
    toks = tokens(col)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / F.size(toks)
    )


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence + moderate punctuation. Deterministic, documented weights."""
    n = token_count(col)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(col) * 4.0, F.lit(0.0))
    return F.round((len_score * 0.4 + stop_score * 0.4 + punct_pen * 0.2), 4)


def lang_id(col) -> Column:
    """Marker-based language ID: first matching marker wins, 'und'
    otherwise. An n-gram-frequency heuristic, expressible in pure SQL
    (mirrored in the DuckDB oracle)."""
    expr = F.lit("und")
    for lang, pat in reversed(_LANG_MARKERS):
        expr = F.when(F.lower(col).rlike(pat), F.lit(lang)).otherwise(expr)
    return expr


def normalize_for_fingerprint(col) -> Column:
    """lower + collapse whitespace — canonical form for content hashing."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint_sha256(col) -> Column:
    """Document fingerprint: sha256 of the normalized text."""
    return F.sha2(normalize_for_fingerprint(col), 256)


def sha_hash60(col, prefix: str | None = None) -> Column:
    """Cross-engine 60-bit hash: first 15 hex chars of sha256 as a
    positive bigint. DuckDB computes the identical value via
    ``CAST('0x' || substr(sha256(x),1,15) AS BIGINT)``, which makes
    sketch operators (MinHash/SimHash) oracle-checkable; xxhash64
    stays the fast path for pipeline use. 60 bits keeps the value
    inside signed-long range (ANSI-safe) with headroom for shifts."""
    s = F.concat(F.lit(f"{prefix}:"), col) if prefix is not None else col
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long")


def rolling_hashes(col, k: int = 8) -> Column:
    """k-gram rolling fingerprints: xxhash64 of each k-char window of
    the normalized text (winnowing-style document fingerprinting).
    Returns array<bigint>."""
    norm = normalize_for_fingerprint(col)
    n_windows = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_windows)
    return F.transform(idx, lambda i: F.xxhash64(F.substr(norm, i, F.lit(k))))


def winnow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS sketch): from the stream of k-gram rolling
    hashes, keep only the MINIMUM hash of every sliding window of
    ``w`` consecutive hashes, breaking ties toward the RIGHTMOST
    position. Returns (id_col, wpos, h) — the distinct selected
    (position, hash) pairs, ~2/(w+1) of the raw hash stream.

    This is the select step that makes rolling fingerprints sublinear
    at corpus scale: a 100-TB dedup stores the winnowed sketch, not
    one hash per character (the guarantee: any shared substring of
    length >= w+k-1 contributes at least one common selected hash).

    Physical plan: explode to one row per k-gram, ONE shuffle on
    id_col for the sliding-window min (min over a struct (h, -pos) —
    lexicographic, so ties pick the larger pos), then a map-side-
    partial distinct. ``hash_fn`` "xxhash64" (bigint, fast path) or
    "sha60" (15-hex-char sha256 slice — cross-engine, used by the
    DuckDB oracle query).
    """
    if hash_fn not in ("xxhash64", "sha60"):
        raise ValueError("hash_fn must be 'xxhash64' or 'sha60'")
    from getl_spark.partitioning import widen_small_scan

    norm = normalize_for_fingerprint(F.col(text_col))
    m = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    # the per-character explode + k-gram hashing is scan-stage CPU —
    # widen a small single-file corpus first (no-op at scale)
    base = widen_small_scan(df.select(id_col, text_col)).select(
        id_col,
        norm.alias("_n"),
        m.alias("_m"),
        F.explode(F.sequence(F.lit(1), m)).alias("pos"),
    )
    gram = F.substring(F.col("_n"), F.col("pos"), F.lit(k))
    h = (
        F.xxhash64(gram)
        if hash_fn == "xxhash64"
        else F.substring(F.sha2(gram, 256), 1, 15)
    )
    hashed = base.select(id_col, "_m", "pos", h.alias("h"))
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    sel = F.min(F.struct(F.col("h").alias("h"), (-F.col("pos")).alias("np"))).over(frame)
    return (
        hashed.withColumn("_sel", sel)
        # a window is complete at pos >= w; a doc shorter than w hashes
        # contributes its single all-rows window (ending at pos == _m)
        .filter((F.col("pos") >= w) | ((F.col("_m") < w) & (F.col("pos") == F.col("_m"))))
        .select(
            F.col(id_col),
            (-F.col("_sel.np")).cast("bigint").alias("wpos"),
            F.col("_sel.h").alias("h"),
        )
        .distinct()
    )


def char_shingles(col, k: int = 5) -> Column:
    """Distinct k-char shingles of normalized text — array<string>."""
    norm = normalize_for_fingerprint(col)
    n_windows = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows), lambda i: F.substr(norm, i, F.lit(k))
        )
    )


def word_shingles(col, k: int = 3) -> Column:
    """Distinct k-word shingles — array<string>."""
    toks = tokens(normalize_for_fingerprint(col))
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )
