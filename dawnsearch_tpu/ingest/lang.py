"""English detection for the ingestion filter.

The reference filters to English via the `whichlang` trigram classifier
(page_source.rs:119-121). Here: a stopword-ratio + script-ratio
heuristic — zero-dependency, ~µs per page, and conservative in the same
direction (prefer dropping a borderline page over indexing junk).
"""

from __future__ import annotations

import re

_STOPWORDS = frozenset(
    "the of and a to in is was for on that with as by at it from be are "
    "this an or his which have had not they her she he but were their has "
    "its will would there been we you all can more if no so what when who "
    "them some into only other time new may these than most also".split()
)

_WORD = re.compile(r"[a-z']+")


def english_score(text: str) -> float:
    """Fraction of words that are common-English stopwords (0..1)."""
    words = _WORD.findall(text.lower())
    if not words:
        return 0.0
    hits = sum(1 for w in words if w in _STOPWORDS)
    return hits / len(words)


def latin_ratio(text: str) -> float:
    """Fraction of alphabetic chars in the basic-Latin range."""
    alpha = [c for c in text if c.isalpha()]
    if not alpha:
        return 0.0
    return sum(1 for c in alpha if ord(c) < 0x250) / len(alpha)


def is_english(text: str, min_stopword_ratio: float = 0.12,
               min_latin: float = 0.85) -> bool:
    """Accept pages that read like running English prose."""
    if latin_ratio(text) < min_latin:
        return False
    return english_score(text) >= min_stopword_ratio
