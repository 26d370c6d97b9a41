"""Text-analysis primitives for 100 TB document pipelines.

All pure Spark column expressions (JVM-side, whole-stage codegen) — no
Python UDFs anywhere in this module. Every primitive has an exact SQL twin
(see :mod:`data_warehouse_spark.queries_catalog`), enabled by one
cross-engine hash:

    h60(s) = int64(big-endian(md5(s) hex chars [2, 17)))       (60 bits)

  Spark:  conv(substring(md5(s), 2, 15), 16, 10) :: bigint
  DuckDB: CAST('0x' || substr(md5(s), 2, 15) AS BIGINT)

Derived: ``h31 = h60 % 2147483647`` (Mersenne prime 2^31−1) keeps all
MinHash arithmetic (a·h+b mod p) inside exact int64 range in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647

# fixed (a, b) parameter pairs for the MinHash family — deterministic,
# pairwise-independent-ish odd multipliers; same constants are baked into
# the SQL twins. 16 functions = 8 bands × 2 rows at the default banding.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1_203_077_459, 598_451_233),
    (784_325_101, 1_443_022_117),
    (911_842_261, 89_274_403),
    (1_679_038_433, 1_952_307_851),
    (354_132_829, 77_321_563),
    (1_864_922_741, 926_541_239),
    (569_872_109, 1_339_845_107),
    (2_046_352_919, 412_893_721),
    (103_984_517, 1_709_245_391),
    (1_521_870_013, 250_091_827),
    (672_943_801, 1_880_235_449),
    (1_394_857_621, 35_712_119),
    (838_102_267, 1_562_349_013),
    (1_988_410_471, 701_294_563),
    (456_037_981, 1_127_894_201),
    (1_730_215_829, 894_372_457),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize(col: Column | str) -> Column:
    """Canonical text: lowercase, non-alphanumerics → space, collapsed."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize(col), " ")


def token_count(col: Column | str) -> Column:
    t = tokens(col)
    return F.when(F.length(normalize(col)) == 0, F.lit(0)).otherwise(F.size(t)).cast(
        "bigint"
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, single symbols —
    the regex proxy for a BPE tokenizer's piece count."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")


def h60(col: Column | str) -> Column:
    """Cross-engine 60-bit content hash (see module docstring)."""
    return F.conv(F.substring(F.md5(_c(col)), 2, 15), 16, 10).cast("bigint")


def h31(col: Column | str) -> Column:
    return h60(col) % MERSENNE31


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles (array<string>); [] when fewer than n tokens.

    Built from sequence+transform over the token array — per-row, no shuffle.
    """
    t = tokens(col)
    return F.array_distinct(
        F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def add_shingles(df, text_col: str = "text", n: int = 3, out_col: str = "shingles"):
    """Distinct n-word shingles of ``text_col`` as a new column, computed by
    the JVM ``ml.feature.NGram`` transformer — ~8× the interpreted
    higher-order-function expression of :func:`word_shingles` at corpus
    scale, byte-identical output (pinned by test). Use this DataFrame-level
    form in operators; the Column form stays for per-row composition."""
    from pyspark.ml.feature import NGram

    toks, grams = f"__toks_{out_col}", f"__grams_{out_col}"
    out = NGram(n=n, inputCol=toks, outputCol=grams).transform(
        df.withColumn(toks, tokens(text_col))
    )
    return out.withColumn(out_col, F.array_distinct(F.col(grams))).drop(toks, grams)


def hashed_shingles(shingles: Column) -> Column:
    """Shingle strings → h31 values as array<int>, computed ONCE (md5 is
    the expensive step; the k-member hash family below is cheap arithmetic
    on top). h31 fits 31 bits, so the element cast — fused into the same
    per-element transform, never a second array pass — halves the width of
    everything downstream that stores or shuffles the hashed set (measured
    at sf30, same box back-to-back: int64 verify 332.3 s vs int32 157.7 s);
    the signature arithmetic re-promotes to bigint for its intermediates."""
    return F.transform(shingles, lambda s: (h60(s) % MERSENNE31).cast("int"))


def minhash_signature(hashed: Column, params=None) -> list[Column]:
    """One min-hash per (a,b) param over pre-hashed shingles — k array_min's,
    all inside the row (zero shuffle for signature computation)."""
    params = params or MINHASH_PARAMS
    return [
        F.array_min(
            # a*h needs 62-bit intermediates — promote explicitly since
            # ``hashed`` carries int32 elements (see hashed_shingles)
            F.transform(
                hashed,
                lambda h: (F.lit(a).cast("bigint") * h + F.lit(b)) % MERSENNE31,
            )
        )
        for a, b in params
    ]


SIMHASH_BITS = 60


def _sql_ref(col: Column | str) -> str | None:
    """Backquoted SQL identifier when the argument is a plain column name;
    None for computed Column objects (those keep the DSL path)."""
    if isinstance(col, str):
        return "`" + col.replace("`", "``") + "`"
    return None


def _simhash60_sql(r: str) -> str:
    """SQL text of :func:`simhash60` — the same fold, parsed in ONE py4j
    round trip instead of ~700 (the 60-wide per-bit array and the power
    array each cost one JVM call per element through the DSL; measured
    1.46 s of the 3.4 s doc_simhash construction — guide §7.3). Catalyst
    trees are identical after constant folding (CASE/shiftright/& are the
    DSL's when/shiftright/bitwiseAND; ``L`` literals are the folded
    ``lit(2**b).cast("bigint")``)."""
    whens = ", ".join(
        f"CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END"
        for b in range(SIMHASH_BITS)
    )
    powers = ", ".join(f"{2 ** b}L" for b in range(SIMHASH_BITS))
    toks = f"split(trim(regexp_replace(lower({r}), '[^a-z0-9]+', ' ')), ' ')"
    hashed = (
        f"transform({toks}, "
        f"s -> CAST(conv(substring(md5(s), 2, 15), 16, 10) AS BIGINT))"
    )
    counts = (
        f"aggregate({hashed}, array_repeat(CAST(0 AS BIGINT), {SIMHASH_BITS}), "
        f"(acc, h) -> zip_with(acc, array({whens}), (a, x) -> a + CAST(x AS BIGINT)))"
    )
    return (
        f"aggregate(zip_with({counts}, array({powers}), "
        f"(c, p) -> CASE WHEN c > 0 THEN p ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def simhash60(col: Column | str) -> Column:
    """60-bit SimHash over full h60 token hashes (bit b set iff Σ_tokens ±1 > 0).

    Width matters at scale: near-dup banding splits the signature into
    ``max_hamming + 1`` bands, and band-bucket size is ~N/2^width. 60 bits
    with 4×15-bit bands gives buckets of ~N/32768 (candidate volume stays
    near-linear at 10⁸⁺ docs), where a 32-bit/8-bit-band signature's ~N/256
    buckets grow quadratically in candidates.

    One fold over the token array: the per-token h60 (the expensive md5) is
    computed exactly once, and a 60-wide ±1 vector is added into a counter
    array (`zip_with`). Pure per-row expression — shuffle-free.
    """
    r = _sql_ref(col)
    if r is not None:
        return F.expr(_simhash60_sql(r))
    t = tokens(col)
    hashed = F.transform(t, lambda s: h60(s))
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for b in range(SIMHASH_BITS)
                ]
            ),
            lambda a, x: a + x.cast("bigint"),
        ),
    )
    powers = F.array(*[F.lit(2**b).cast("bigint") for b in range(SIMHASH_BITS)])
    return F.aggregate(
        F.zip_with(
            counts, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def content_fingerprint(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: left fold of token h31s with a
    polynomial rolling hash (acc·31 + h) mod p — detects exact-sequence
    reuse where the shingle-set methods are order-blind."""
    t = tokens(col)
    return F.aggregate(
        t,
        F.lit(7).cast("bigint"),
        lambda acc, s: (acc * 31 + (h60(s) % MERSENNE31)) % MERSENNE31,
    )


# --- PII redaction rules -----------------------------------------------------
# (name, pattern, replacement). Patterns are restricted to the syntax subset
# where Java regex (Spark) and RE2 (DuckDB) agree — character classes,
# bounded repetition, \b word boundaries; no lookaround, no backreferences —
# so the SQL twin can run the IDENTICAL string. Rules are disjoint by
# construction (emails carry '@', IPv4 is digits-with-dots, phones start
# with '+'), so per-rule match counts on the original text are exact even
# though replacement is applied sequentially.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
]


# --- language-ID heuristic ---------------------------------------------------
# tiny per-language stopword inventories; argmax of hit counts with a
# deterministic tie-break (alphabetical), 'und' when nothing matches.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que"],
}


def lang_hits(col: Column | str, lang: str) -> Column:
    t = tokens(col)
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(t, lambda x: x.isin(*[F.lit(w) for w in words]))
    ).cast("bigint")


def lang_id(col: Column | str) -> Column:
    """argmax over LANG_STOPWORDS hit counts; ties → alphabetically first
    language; zero hits → 'und'."""
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("bigint")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        hits = lang_hits(col, lang)
        cond = (hits > best_hits) | ((hits == best_hits) & (hits > 0))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(hits, best_hits)
    return best_lang


# --- quality scoring -----------------------------------------------------------
def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Heuristic quality signals as exact integers (×1000 ratios via integer
    division — identical across engines)."""
    c = _c(col)
    n_chars = F.length(c).cast("bigint")
    n_tok = token_count(c)
    n_alpha = (n_chars - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))).cast("bigint")
    n_digit = (n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("bigint")
    n_punct = (
        n_chars - F.length(F.regexp_replace(c, r"""[.,;:!?'"()\[\]{}-]""", ""))
    ).cast("bigint")
    n_stop = lang_hits(c, "en")
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))

    def ratio_x1000(num: Column, den: Column) -> Column:
        # floor(num*1000/den): num*1000 and den are exact in double, the
        # quotient is correctly rounded in both engines → identical floor
        return F.floor(num * 1000 / den).cast("bigint")

    # normalized length minus (n_tok−1) separators = total token chars
    tok_chars = (F.length(normalize(c)) - (n_tok - 1)).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len_x1000": ratio_x1000(tok_chars, safe_tok),
        "alpha_ratio_x1000": ratio_x1000(n_alpha, safe_chars),
        "digit_ratio_x1000": ratio_x1000(n_digit, safe_chars),
        "punct_ratio_x1000": ratio_x1000(n_punct, safe_chars),
        "stopword_ratio_x1000": ratio_x1000(n_stop, safe_tok),
    }
