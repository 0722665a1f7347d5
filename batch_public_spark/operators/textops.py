"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference's surface (BASELINE.json north-star): token counting,
quality scoring, language ID, and document fingerprinting over a text
column. All are single-pass column expressions (no UDFs, no shuffles until
the caller aggregates) — at 100 TB these ride along with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword sets for the heuristic scorer/langid.
STOPWORDS_EN = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")
_LANG_MARKERS = (
    # (lang, regex of distinctive characters/words)
    ("zh", r"[一-鿿]"),
    ("ja", r"[぀-ヿ]"),
    ("ko", r"[가-힯]"),
    ("ru", r"[Ѐ-ӿ]"),
    ("ar", r"[؀-ۿ]"),
    ("es", r"(?i)\b(el|la|los|las|una|está|según|también)\b|[ñ¿¡]"),
    ("fr", r"(?i)\b(le|la|les|une|est|être|c'est|d'une)\b|[àâçèêëîïôûù]"),
    ("de", r"(?i)\b(der|die|das|und|ist|nicht|eine|ich)\b|[äöüß]"),
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, no empties)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: F.length(t) > 0)


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: subword chunks of at most 4 word characters
    plus standalone punctuation (``\\w{1,4}|[^\\w\\s]``). A cheap,
    deterministic proxy for tokenizer cost models at corpus scale — real
    BPE averages ~4 chars/token on English, and the greedy 4-char chunking
    reproduces the property that long words cost multiple tokens (the
    whole point of a fertility metric; the earlier ``\\w+`` form counted
    exactly one token per word and was indistinguishable from whitespace
    tokenization on punctuation-free corpora — a vacuous ratio)."""
    return F.regexp_count(text, F.lit(r"\w{1,4}|[^\w\s]")).cast("bigint")


# Explicit ASCII punctuation class — deliberately NOT \p{Punct}: Java and
# RE2 disagree on which ASCII symbols are "punctuation", and the oracle must
# compute the identical set.
PUNCT_CLASS = r"""[.,!?;:()\[\]{}"'`~\-_/\\|@#$%^&*+=<>]"""


def punct_ratio(text: Column) -> Column:
    """Punctuation characters / total characters (0 for empty)."""
    n = F.length(text)
    p = F.regexp_count(text, F.lit(PUNCT_CLASS))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Stopword tokens / total tokens (0 for empty)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic in the Gopher/C4-filter spirit:
    rewards moderate length, low punctuation density, some stopwords, and
    sane mean word length. Deterministic and fully JVM-side."""
    n_tok = token_count_ws(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 5, F.lit(1.0))
    mwl = mean_word_len(text)
    mwl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.3)
    return (len_score * 0.3 + punct_pen * 0.3 + sw_score * 0.2 + mwl_score * 0.2).cast("double")


def lang_id(text: Column, default: str = "en") -> Column:
    """Heuristic language ID: first matching script-range / marker-word
    pattern wins, else ``default``. An n-gram model would be a broadcast
    lookup + the same expression shape."""
    expr = F.lit(default)
    for lang, pattern in reversed(_LANG_MARKERS):
        expr = F.when(F.regexp_like(text, F.lit(pattern)), F.lit(lang)).otherwise(expr)
    return expr


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text — the exact-dedup
    key. Stable across engines (oracle-checkable)."""
    return F.md5(normalized_text(text))


# Rolling-hash parameters: per-char hashes reduced to [0, 2**40) so the
# polynomial combine h*P + y stays < 2**61 — no int64 overflow, which under
# ANSI mode (Spark 4 default) would throw mid-scan. 2**40 hash space keeps
# birthday collisions negligible at posting-list scale (~1e-12 per pair).
_FP_MOD = 1 << 40
_FP_PRIME = 1_000_003


def _window_hashes(text: Column, k: int) -> Column:
    """array<long> of polynomial rolling hashes over all k-char windows of
    the normalized text. Hash each char ONCE (xxhash64 → 40-bit), then
    combine k shifted slices of the numeric array with zip_with
    multiply-add — all fixed-width long arithmetic, no intermediate window
    strings (measured ~1.8× faster than concat_ws string windows, and ~60×
    faster than ``transform(sequence, i -> substr(...))`` whose lambda
    re-evaluates the normalization regexes per position; an
    ``element_at``-indexed lambda is slower still — it drops out of
    codegen entirely)."""
    chars = F.split(normalized_text(text), "")
    h = F.transform(chars, lambda c: F.pmod(F.xxhash64(c), F.lit(_FP_MOD)))
    length = F.greatest(F.size(chars) - (k - 1), F.lit(1))
    win = F.slice(h, 1, length)
    for i in range(2, k + 1):
        # coalesce the null padding of past-the-end slices to 0: truncated
        # trailing windows hash consistently (the role concat_ws's
        # null-skipping played in the string formulation).
        win = F.zip_with(
            win,
            F.slice(h, i, length),
            lambda x, y: F.pmod(x * F.lit(_FP_PRIME) + F.coalesce(y, F.lit(0)), F.lit(_FP_MOD)),
        )
    return win


def fingerprint_winnow(text: Column, k: int = 8, keep: int = 4) -> Column:
    """Winnowing-style rolling fingerprint: rolling hashes over k-char
    windows of the normalized text, keep the ``keep`` smallest (a
    deterministic min-sample of the document's local substrings).
    Near-duplicate documents share most fingerprint elements. One
    expression, no explode."""
    return F.slice(F.array_sort(F.array_distinct(_window_hashes(text, k))), 1, keep)


def fingerprint_modp(text: Column, k: int = 8, p: int = 64) -> Column:
    """Broder-style 0-mod-p fingerprint sample: ALL k-char-window hashes
    ≡ 0 (mod p) — an expected 1/p uniform sample of each document's
    windows. Unlike the ``keep``-smallest winnow selection, the sample is
    position-uniform per document, so two documents share fingerprints in
    proportion to their actual k-gram overlap (the smallest-k selection
    degenerates on low-entropy corpora where every document contains the
    globally-minimal windows)."""
    return F.array_distinct(F.filter(_window_hashes(text, k), lambda h: F.pmod(h, F.lit(p)) == 0))


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Ordered (pattern, replacement) rules. Order matters: the card/SSN digit
# shapes must run before the generic phone rule would eat their digits.
# ASCII-only character classes — Java regex and any oracle engine agree on
# these; \p{...} classes would not be portable.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
    (r"(?<![\w<])\+?\d[\d().\- ]{7,}\d\b", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Redact email / SSN / card-number / phone-shaped substrings with
    typed placeholders. A chain of native ``regexp_replace`` calls — stays
    in whole-stage codegen, no UDF; at corpus scale this is a free rider
    on the scan (reference has no PII surface; this belongs to the
    training-data-hygiene family BASELINE.json's north-star adds)."""
    out = text
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(text: Column) -> Column:
    """Number of PII-shaped substrings ``redact_pii`` would replace.
    Counted on the progressively-redacted text so overlapping rules never
    double-count one substring."""
    out = text
    total = F.lit(0).cast("bigint")
    for pat, repl in PII_RULES:
        total = total + F.regexp_count(out, F.lit(pat)).cast("bigint")
        out = F.regexp_replace(out, pat, repl)
    return total


def nfc_text(text: Column) -> Column:
    """Unicode NFC canonical normalization as an Arrow-batched pandas UDF
    (Spark has no built-in normalizer expression; per-batch
    ``unicodedata.normalize`` is the standard curation shape — one Arrow
    round-trip, no per-row pickling). Canonically-equivalent byte
    sequences (precomposed vs combining marks, reordered combining
    classes, singleton compatibility points like U+212B) map to ONE
    dedup key — without this, exact dedup silently treats 'café' and
    'cafe'+U+0301 as distinct documents. NULL passes through."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # pd.Series -> pd.Series
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(text)
