"""Text functions: tokenization, normalization, shingling, fingerprints.

The reference's only text function is an IK Chinese-segmentation UDTF
(``rt/app/func/SplitFunction.java:12-27``, ``rt/utils/KeyWordUtil.java``)
used with ``LATERAL TABLE`` + explode. We generalize to a deterministic
JVM-side tokenizer built from ``split``/``regexp_extract_all`` (no
Python UDF in the hot path — stays inside whole-stage codegen), plus
the text-pipeline primitives a training-data pipeline needs: shingles
for MinHash/Jaccard dedup and md5 fingerprints of normalized text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-ish tokens: letter runs or digit runs (BPE-ish pre-tokenization)
TOKEN_RE = "[a-z]+|[0-9]+"
PUNCT_RE = "[.,!?;:]"


def normalize_text(c: Column | str) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def tokenize(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(c), " ")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles of a token array → array<string>.

    Callers must pre-filter rows with ``size(tokens) >= n`` (the
    sequence bound is invalid otherwise).
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + k + 1) for k in range(n)]),
    )


def fingerprint(c: Column | str) -> Column:
    """md5 fingerprint of normalized text (content-defined identity)."""
    return F.md5(normalize_text(c).cast("binary"))
