"""Text-analysis functions for large-scale corpus curation.

All hot-path functions are pure Column expressions (JVM-side,
whole-stage codegen) — no Python in the loop. Each has an exact ANSI
SQL twin used by the DuckDB oracle in ``__spark_entry__.py``, so the
semantics are pinned cross-engine, not just "looks right".

These extend the reference's surface (memorious has no text analytics
beyond scrapers) toward the training-data-pipeline ops a 100 TB
corpus needs: token counting, quality scoring, language ID,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from memorious_spark.functions.hof import bind_once

__all__ = [
    "token_count",
    "bpe_token_count",
    "alpha_ratio",
    "stopword_hits",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "shingles",
    "minhash_signature",
    "py_normalize_text",
    "normalize_text_udf",
    "UNICODE_SPACES",
]

# language → marker words (spaces matter: match whole tokens mid-text).
# Data-derived: the top function words of each language's frequency
# list (the public Zipf heads — 'the/and/of', 'der/und/die', …),
# hand-pruned to keep cross-language collisions low (e.g. Dutch keeps
# 'het/een/niet' because 'de' is also Spanish/French/Portuguese).
# 12 languages; still an honest n-gram-free heuristic, not fasttext —
# the sandbox has no model weights, and the whole table stays inside
# whole-stage codegen as literal match counts.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "es": [" el ", " la ", " que ", " los ", " una "],
    "de": [" der ", " und ", " die ", " das ", " nicht "],
    "fr": [" le ", " et ", " les ", " des ", " est "],
    "pt": [" não ", " uma ", " com ", " para ", " mais "],
    "it": [" il ", " che ", " per ", " della ", " sono "],
    "nl": [" het ", " een ", " van ", " niet ", " ik "],
    "ru": [" и ", " в ", " не ", " что ", " это "],
    "pl": [" i ", " w ", " nie ", " się ", " jest "],
    "tr": [" bir ", " ve ", " bu ", " için ", " ile "],
    "sv": [" och ", " att ", " det ", " som ", " på "],
    "id": [" yang ", " dan ", " di ", " dengan ", " untuk "],
}


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via the length-difference identity —
    exactly replicable in any SQL dialect."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space-normalized input).

    SQL twin: ``length(t) - length(replace(t,' ','')) + 1``.
    """
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


# GPT-2-style pre-tokenizer (Radford et al. 2019, the public
# gpt2/encoder.py pattern) minus the trailing-space lookahead:
# RE2 (DuckDB's engine) has no lookahead, and dropping it provably
# preserves the MATCH COUNT — the lookahead only moves one leading
# space from a whitespace run into the following word token.
# Both java.util.regex and RE2 read \p{L}/\p{N} identically.
_BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of GPT-2 pre-tokenizer segments.

    This is the standard cheap proxy for "how many tokens will the
    tokenizer emit" (pre-tokenization is the unit BPE merges within;
    actual BPE splits each segment further, so this is a stable lower
    bound with a corpus-constant ratio). One ``regexp_count`` — stays
    in whole-stage codegen, no UDF, no vocab file.

    SQL twin: ``length(regexp_extract_all(t, <same pattern>))``.
    """
    return F.regexp_count(text, F.lit(_BPE_PRETOKEN_RE)).cast("long")


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters.

    SQL twin: ``length(regexp_replace(t,'[^a-zA-Z]','','g')) / length(t)``.
    """
    return F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.length(text)


def stopword_hits(text: Column) -> Column:
    """Count of common-English stopword occurrences (padded match)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    out = F.lit(0.0)
    for w in (" the ", " a ", " and ", " of ", " to "):
        out = out + _occurrences(padded, w)
    return out


def quality_score(text: Column) -> Column:
    """Deterministic [0,1]-ish quality heuristic: alpha ratio ×
    saturating length term + stopword presence bonus."""
    n = token_count(text).cast("double")
    sat_len = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_frac = F.least(stopword_hits(text) / n, F.lit(1.0))
    return F.round(
        alpha_ratio(text) * F.lit(0.5) + sat_len * F.lit(0.3) + stop_frac * F.lit(0.2),
        6,
    )


def lang_guess(text: Column) -> Column:
    """Marker-word language ID: argmax of per-language marker counts,
    'und' when all zero. Deterministic tie-break by language order
    (earlier wins).

    Shape matters at 12 languages: a when/otherwise fold re-nests
    every prior score into each comparison (O(L²·markers) expression
    nodes), and replace-based occurrence counting re-scans the full
    text once per marker (60 passes). Instead: tokenize ONCE, score
    each language as the count of tokens in its marker set (one
    array-filter per language over the short token array — identical
    counts to the padded-substring formulation on space-separated
    text), and take ``array_max`` over (score, rank) structs — struct
    ordering gives argmax with the rank field breaking ties toward
    earlier languages. "Tokenize once" needs :func:`bind_once` to be
    literally true: twelve sibling ``filter`` expressions over an
    inlined split each re-run it (HOF lambdas see no CSE)."""
    langs = list(_LANG_MARKERS)

    def _in_set(words):  # closure, not a default arg: F.filter reads
        return lambda t: t.isin(*words)  # lambda arity as (value, idx)

    def best_lang(toks: Column) -> Column:
        entries = [
            F.struct(
                F.size(
                    F.filter(
                        toks,
                        _in_set(
                            tuple(m.strip() for m in _LANG_MARKERS[lang])
                        ),
                    )
                ).alias("s"),
                F.lit(len(langs) - i).alias("r"),  # higher = earlier lang
            )
            for i, lang in enumerate(langs)
        ]
        return F.array_max(F.array(*entries))

    def pick(best: Column) -> Column:
        idx = (F.lit(len(langs) + 1) - best["r"]).cast("int")
        return F.when(
            best["s"] > 0,
            F.element_at(F.array(*[F.lit(l) for l in langs]), idx),
        ).otherwise(F.lit("und"))

    # nested binds: tokenize once, score once (the scored struct is
    # itself referenced twice by the argmax unwrap)
    return bind_once(
        F.split(F.trim(F.lower(text)), " "),
        lambda toks: bind_once(best_lang(toks), pick),
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, space-collapsed text.

    SQL twin: ``md5(trim(regexp_replace(lower(t),'\\s+',' ','g')))``.
    """
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles as an array<string> (word n-grams); texts
    shorter than k tokens yield one truncated shingle.

    SQL twin in DuckDB: list comprehension over ``string_split``.

    Tokens bound once (:func:`bind_once`) — inlined, the split
    re-runs per shingle position inside the interpreted transform.
    """

    def sh(toks: Column) -> Column:
        n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda j: F.concat_ws(" ", F.slice(toks, j, k)),
        )

    return bind_once(F.split(F.trim(text), " "), sh)


def minhash_signature(shingle_col: Column, n_perm: int = 16) -> Column:
    """MinHash signature as array<string>: per permutation ``i``, the
    lexicographic min of ``md5(i || ':' || shingle)``.

    Using md5-strings keeps the signature bit-for-bit reproducible in
    any engine with md5 (the DuckDB oracle computes the identical
    signature); min-of-hash over strings preserves the MinHash
    collision property (P[sig_i equal] = Jaccard).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                shingle_col,
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )


# ---- unicode normalization (the pre-dedup canonical form) ----------

# Unicode Zs space separators enumerated EXPLICITLY (not \p{Zs} /
# unicodedata category lookups) so engine and oracle agree regardless
# of their Unicode table versions.
UNICODE_SPACES = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u202f\u205f\u3000"
)
# C0/C1 control chars minus \t and \n (\r sits inside and is dropped —
# CRLF therefore collapses to LF)
_CONTROL_RANGES = (
    (0x00, 0x08), (0x0B, 0x1F), (0x7F, 0x9F),
)
_CONTROL_SET = frozenset(
    chr(c) for lo, hi in _CONTROL_RANGES for c in range(lo, hi + 1)
)


def py_normalize_text(t: str | None) -> str | None:
    """Shared-kernel text normalization, the pre-dedup canonical form
    every published webtext pipeline applies before hashing (CCNet /
    RefinedWeb normalize unicode so 'café' NFC and 'cafe\\u0301' NFD
    dedup together): NFC, unicode space separators → ASCII space,
    control chars (minus tab/newline) dropped."""
    import unicodedata

    if t is None:
        return None
    t = unicodedata.normalize("NFC", t)
    out = []
    for ch in t:
        if ch in UNICODE_SPACES:
            out.append(" ")
        elif ch in _CONTROL_SET:
            continue
        else:
            out.append(ch)
    return "".join(out)


def normalize_text_udf():
    """Arrow-batched pandas UDF over :func:`py_normalize_text` — NFC
    has no Column builtin, so this is the one curation function that
    must cross the Arrow boundary (string-in/string-out, vectorized
    batches; the oracle twin is DuckDB's ``nfc_normalize`` + the same
    explicit character classes)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(texts):
        return pd.Series([py_normalize_text(t) for t in texts])

    return _norm
