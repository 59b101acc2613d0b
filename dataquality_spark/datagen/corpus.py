"""Deterministic toy corpora + sentence generators.

Two synthetic "languages" with deliberately different character statistics:

* ``en`` — common-English word list (the expected transcript language);
* ``xx`` — a pseudo-Germanic/Slavic word list whose character trigrams are
  disjoint enough from ``en`` for a char-n-gram language-ID model to separate
  them reliably.

Everything is driven by a small splitmix-style PRNG keyed on integers so the
same (seed, index) always yields the same sentence in every process — no
RNG-call-order or PYTHONHASHSEED dependence.
"""

from __future__ import annotations

EN_WORDS = [
    "the", "of", "and", "to", "in", "is", "you", "that", "it", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "word", "but", "not",
    "what", "all", "were", "we", "when", "your", "can", "said", "there",
    "use", "an", "each", "which", "she", "do", "how", "their", "if", "will",
    "up", "other", "about", "out", "many", "then", "them", "these", "so",
    "some", "her", "would", "make", "like", "him", "into", "time", "has",
    "look", "two", "more", "write", "go", "see", "number", "no", "way",
    "could", "people", "my", "than", "first", "water", "been", "call",
    "who", "oil", "its", "now", "find", "long", "down", "day", "did",
    "get", "come", "made", "may", "part", "over", "new", "sound", "take",
    "only", "little", "work", "know", "place", "year", "live", "me",
    "back", "give", "most", "very", "after", "thing", "our", "just",
    "name", "good", "sentence", "man", "think", "say", "great", "where",
    "help", "through", "much", "before", "line", "right", "too", "mean",
    "old", "any", "same", "tell", "boy", "follow", "came", "want", "show",
    "also", "around", "form", "three", "small", "set", "put", "end",
    "does", "another", "well", "large", "must", "big", "even", "such",
    "because", "turn", "here", "why", "ask", "went", "men", "read",
    "need", "land", "different", "home", "us", "move", "try", "kind",
    "hand", "picture", "again", "change", "off", "play", "spell", "air",
    "away", "animal", "house", "point", "page", "letter", "mother",
    "answer", "found", "study", "still", "learn", "should", "america",
    "world", "high", "every", "near", "add", "food", "between", "own",
]

XX_WORDS = [
    "zvysk", "grzny", "schwyt", "kralov", "pszczy", "drzwi", "wyszk",
    "szczur", "mrozny", "krtiny", "vlk", "smrt", "zmrzl", "ctvrt",
    "hrdlo", "prst", "vrch", "krk", "plz", "brzy", "trzy", "grzmot",
    "szybko", "czwart", "dziwny", "krzyk", "przez", "wszyst", "jeszcze",
    "zhruba", "ktery", "mozna", "nekdy", "spolecn", "zpusob", "dulezit",
    "tschlag", "pfropf", "knopfl", "schrumpf", "zwitsch", "quetsch",
    "strumpf", "dampfsch", "kraftwrk", "grundstck", "durchzg", "aufwnd",
    "herbstlch", "zwischnzt", "pflanzng", "schwrz", "gestrpp", "knckwurst",
    "vzhled", "obzvlast", "ctnost", "hbitov", "jablko", "mlceni",
    "szklo", "zgrzyt", "chrzan", "wrzesien", "krzeslo", "zdzblo",
]

GIBBERISH_CHARS = "bcdfghjklmnpqrstvwxz"

# Deliberately mild toxicity lexicon for the Value-dimension rule (the
# reference's rubric flags "bias, toxicity, PII" — bedrock.py:211-214).
TOXIC_WORDS = ["frakking", "dreck", "scumward", "hateclot"]


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic integer mixer."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def rand_ints(seed: int, stream: int, count: int) -> list[int]:
    """``count`` deterministic 64-bit ints for (seed, stream)."""
    base = _mix(seed * 0x100000001B3 + stream)
    return [_mix(base + i) for i in range(count)]


def sentence(seed: int, stream: int, n_tokens: int, words: list[str] | None = None) -> str:
    """Deterministic sentence of ``n_tokens`` words from the given list."""
    words = words if words is not None else EN_WORDS
    ints = rand_ints(seed, stream, n_tokens)
    return " ".join(words[v % len(words)] for v in ints)


def gibberish(seed: int, stream: int, n_tokens: int) -> str:
    """Consonant-soup tokens — high perplexity under the EN char LM."""
    ints = rand_ints(seed, stream, n_tokens * 2)
    toks = []
    for i in range(n_tokens):
        ln = 4 + ints[2 * i] % 6
        chars = rand_ints(seed, stream * 7919 + i + 1, ln)
        toks.append("".join(GIBBERISH_CHARS[c % len(GIBBERISH_CHARS)] for c in chars))
    return " ".join(toks)


def training_text(words: list[str], seed: int = 1234, n_tokens: int = 20000) -> str:
    """Fixed training stream for the langid / perplexity models."""
    return sentence(seed, 0, n_tokens, words)
