"""Text functions: tokenization, normalization, shingling, fingerprints.

The reference's only text function is an IK *Chinese*-segmentation UDTF
(``rt/app/func/SplitFunction.java:12-27``, ``rt/utils/KeyWordUtil.java:13-33``
— IKSegmenter at :20) used with ``LATERAL TABLE`` + explode. We keep the
no-Python-UDF property by building a deterministic JVM-side tokenizer
from ``split``/``regexp_extract_all``/``transform`` (stays inside
whole-stage codegen) that handles BOTH script families the reference's
workload contains:

- Latin/digit text: lowercase, strip punctuation, whitespace tokens
  (mixed alnum like ``abc123`` stays one token — parity with the old
  ASCII tokenizer, so every existing oracle is unchanged on ASCII).
- CJK text: overlapping character **bigrams** per Han run (the classic
  CJKAnalyzer strategy — deterministic, dictionary-free, and the
  standard stand-in for IK's dictionary segmentation). A length-1 Han
  run tokenizes to the single character; Latin runs embedded inside a
  CJK token are kept whole.

Every DuckDB oracle that tokenizes mirrors the exact same pipeline via
``norm_sql``/``toks_sql`` below, so tokenization stays value-checked on
CJK input too (see ``t_cjk_keyword_counts``).

Also here: the text-pipeline primitives a training-data pipeline needs —
shingles for MinHash/Jaccard dedup and md5 fingerprints of normalized
text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-ish tokens: letter runs or digit runs (BPE-ish pre-tokenization)
TOKEN_RE = "[a-z]+|[0-9]+"
PUNCT_RE = "[.,!?;:]"

# Han-script detection: Java regex (Spark) and RE2 (DuckDB) spellings.
# The normalize/tokenize pipelines must use each engine's own syntax but
# identical semantics (the Unicode Han script property).
_HAN_JAVA = r"\p{IsHan}"
_HAN_RE2 = r"\p{Han}"

# Cheap fast-path probe: any non-ASCII byte. The Han-aware and plain-ASCII
# normalize/tokenize branches produce IDENTICAL output for every Han-free
# row, so the gate only has to be conservative (never send a Han row down
# the fast path) — a code-point range check costs far less per char than
# the \p{IsHan} script-property scan, and mis-routing an accented-Latin
# row to the slow branch changes nothing but speed.
_NON_ASCII = r"[^\x00-\x7F]"


def normalize_text(c: Column | str) -> Column:
    """lower → strip non-(alnum|Han) → collapse whitespace → trim.

    On pure-ASCII input this is exactly the old ``[^a-z0-9]+`` rewrite
    (and runs it — the ASCII-only probe keeps the Han char class out of
    the hot loop); Han characters survive normalization instead of
    vanishing (the round-3 F1 fidelity gap: the reference's actual
    workload is Chinese search keywords).
    """
    col = F.col(c) if isinstance(c, str) else c
    low = F.lower(col)
    return F.trim(
        F.when(
            ~col.rlike(_NON_ASCII),
            F.regexp_replace(low, "[^a-z0-9]+", " "),
        ).otherwise(
            F.regexp_replace(low, f"[^a-z0-9{_HAN_JAVA}]+", " ")
        )
    )


def _han_bigrams(run: Column) -> Column:
    """Overlapping bigrams of a pure-Han run ('你好吗' → [你好, 好吗])."""
    return F.when(F.length(run) == 1, F.array(run)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(run) - 1),
            lambda i: run.substr(i, F.lit(2)),
        )
    )


def _expand_token(tok: Column) -> Column:
    """Whitespace token → final token list (identity for non-CJK)."""
    runs = F.regexp_extract_all(tok, F.lit(f"[a-z0-9]+|{_HAN_JAVA}+"), 0)
    return F.when(~tok.rlike(_HAN_JAVA), F.array(tok)).otherwise(
        F.flatten(
            F.transform(
                runs,
                lambda r: F.when(~r.rlike(f"^{_HAN_JAVA}"), F.array(r)).otherwise(
                    _han_bigrams(r)
                ),
            )
        )
    )


def tokenize(c: Column | str) -> Column:
    """Tokenize normalized text → array<string> (F1 parity surface).

    Whitespace split, then CJK-aware expansion. The Han probe is ONE
    ``rlike`` on the whole normalized row: rows with no Han character
    (the overwhelming majority of a mixed corpus, and all of a Latin
    one) take the wholesale ``split`` — the exact pre-CJK fast path —
    and only Han-bearing rows pay the per-token expansion. Han text
    yields overlapping bigrams that flow into keyword counts,
    shingles, MinHash and SimHash without vanishing.
    """
    col = F.col(c) if isinstance(c, str) else c
    plain = F.split(normalize_text(col), " ")
    # probe the RAW column with the same cheap ASCII gate as
    # normalize_text (shared subexpression in codegen): normalization
    # never introduces Han, and a non-Han non-ASCII row's tokens all
    # take _expand_token's identity branch, so routing it to the slow
    # branch is value-identical — only Han rows pay the bigram work.
    return F.when(~col.rlike(_NON_ASCII), plain).otherwise(
        F.flatten(F.transform(plain, _expand_token))
    )


def norm_sql(col: str = "text") -> str:
    """DuckDB mirror of ``normalize_text`` (RE2 Han-class spelling)."""
    return (
        f"trim(regexp_replace(lower({col}), '[^a-z0-9{_HAN_RE2}]+', ' ', 'g'))"
    )


def toks_sql(col: str = "text") -> str:
    """DuckDB mirror of ``tokenize`` — identical token stream, any script
    (same raw-column Han fast path; a Han-free row's tokens all take the
    identity branch, so the wholesale split is equivalent)."""
    return f"""CASE WHEN NOT regexp_matches({col}, '{_HAN_RE2}')
      THEN string_split({norm_sql(col)}, ' ')
      ELSE flatten(list_transform(string_split({norm_sql(col)}, ' '),
      tok -> CASE WHEN NOT regexp_matches(tok, '{_HAN_RE2}') THEN [tok]
             ELSE flatten(list_transform(
                    regexp_extract_all(tok, '[a-z0-9]+|{_HAN_RE2}+'),
                    r -> CASE WHEN NOT regexp_matches(r, '^{_HAN_RE2}') THEN [r]
                         WHEN length(r) = 1 THEN [r]
                         ELSE list_transform(range(1, length(r)),
                                             i -> substring(r, i, 2)) END))
             END)) END"""


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles of a token array → array<string>.

    Total on any input: arrays shorter than ``n`` yield an EMPTY
    array. The guard is load-bearing, not cosmetic — Spark's
    ``sequence(0, size - n)`` auto-reverses when the stop is negative
    (sequence(0, -2) = [0, -1, -2]), so an unguarded short array
    doesn't produce zero shingles, it produces out-of-bounds
    ``element_at`` calls that kill the task. Found by the
    random-corpus differential test on a one-token document.
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    shingled = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + k + 1) for k in range(n)]),
    )
    return F.when(F.size(tokens) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(c: Column | str) -> Column:
    """md5 fingerprint of normalized text (content-defined identity)."""
    return F.md5(normalize_text(c).cast("binary"))


def md5_long(c: Column, start: int = 1, hex_chars: int = 8) -> Column:
    """``hex_chars`` hex digits of md5 starting at ``start``, as a long.

    The one integer-hash primitive behind rolling fingerprints,
    MinHash double hashing, SimHash token hashes, and winnowing gram
    hashes. DuckDB twin: ``CAST(concat('0x', substr(md5(x), start,
    n)) AS BIGINT)`` — keep both spellings in lock-step; ≤ 15 hex
    chars stays inside int64.
    """
    return F.conv(F.substring(F.md5(c.cast("binary")), start, hex_chars), 16, 10).cast(
        "long"
    )
