"""Deterministic greedy subword tokenizer (WordPiece-style longest
match over a COMMITTED vocab), pure Spark-SQL higher-order functions —
no UDF, no external tokenizer library.

Why: chunk/pack budgets counted in whitespace words mis-size training
sequences by ~1.3-1.5x vs real BPE lengths. A greedy longest-match
tokenizer over a fixed vocab approximates BPE token counts while
staying exactly recomputable in the DuckDB oracles (the greedy rule is
a pure function of (word, vocab); the oracle replays it with a
recursive CTE — __spark_entry__.oracle_sql()['chunk_subword']).

Tokenization rule (per whitespace word, after the shared norm_words
lowercasing): starting at offset 0, consume the LONGEST vocab entry
that is a prefix of the remainder; if none matches, consume one
character (unknown fallback — guarantees termination and means the
vocab does not need full character coverage). Token count of a word =
number of consume steps; of a chunk/doc = sum over its words.

The committed vocab is frequency-ordered English subwords + digits.
Entries are matched longest-first; among equal lengths at one offset at
most one can match (distinct equal-length strings cannot both be
prefixes of the same remainder), so the greedy rule is unambiguous.
"""

from __future__ import annotations

# Committed tokenizer vocab. ORDER IS PART OF THE CONTRACT only via
# length (longest-first matching); the list itself must stay in lockstep
# with the DuckDB oracle, which interpolates it from here.
SUBWORD_VOCAB: list[str] = [
    # 4+ char units
    "tion", "ment", "able", "ness", "ight", "ound", "ther", "ing",
    # 3-char units
    "the", "and", "ed", "er", "ion", "pre", "con", "com", "ter",
    "est", "ant", "ent", "ous", "ive", "ate", "ure", "age",
    # 2-char units
    "re", "on", "at", "en", "es", "an", "in", "ar", "or", "al",
    "le", "is", "it", "ou", "ti", "te", "st", "nt", "nd", "se",
    "ve", "ly", "ex", "un", "de", "of", "to", "qu", "ch", "sh",
    "th", "wh", "ck", "ro", "ra", "li", "la", "lo", "ma", "me",
    "mi", "ne", "no", "pa", "po", "sa", "si", "so", "ta", "ta",
    # digits (single chars keep numeric tokens short)
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
]
# De-dup while preserving first occurrence, then sort longest-first for
# greedy matching (stable for determinism).
_SEEN: dict[str, None] = {}
for _v in SUBWORD_VOCAB:
    _SEEN.setdefault(_v, None)
SUBWORD_VOCAB = sorted(_SEEN, key=lambda v: (-len(v), v))


def _vocab_array_sql(vocab: list[str] | None = None) -> str:
    vs = SUBWORD_VOCAB if vocab is None else sort_vocab(vocab)
    quoted = ", ".join("'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'" for v in vs)
    return "array(" + quoted + ")"


def sort_vocab(vocab: list[str]) -> list[str]:
    """Longest-first (then lexicographic) order — the greedy-match
    contract; dedups while keeping determinism."""
    return sorted(dict.fromkeys(vocab), key=lambda v: (-len(v), v))


def subword_count_word_sql(w: str, vocab: list[str] | None = None) -> str:
    """SQL expression: greedy-subword token count of ONE word expression
    ``w`` over ``vocab`` (default: the committed SUBWORD_VOCAB; any
    custom list — e.g. bpe_learn's merged symbols — is sorted
    longest-first here). Bounded fold: at most length(w) consume steps
    (each step advances >= 1 char); sequence(1, n) is guarded against
    the empty word (sequence(1, 0) is DESCENDING in Spark — the known
    gotcha)."""
    vocab = _vocab_array_sql(vocab)
    return (
        f"CASE WHEN length({w}) = 0 THEN 0 ELSE "
        f"aggregate(sequence(1, length({w})), named_struct('p', 0, 'n', 0), "
        f"(acc, stp) -> CASE WHEN acc.p >= length({w}) THEN acc ELSE "
        f"named_struct('p', acc.p + coalesce(length(try_element_at("
        f"filter({vocab}, sv -> substr({w}, acc.p + 1, length(sv)) = sv), 1)), 1), "
        f"'n', acc.n + 1) END, "
        f"acc -> acc.n) END"
    )


def subword_count_words_sql(words: str, vocab: list[str] | None = None) -> str:
    """SQL expression: total greedy-subword tokens over an
    array<string> expression ``words`` (sum of per-word counts)."""
    return (
        f"aggregate({words}, 0, (tot, wd) -> tot + "
        + subword_count_word_sql("wd", vocab)
        + ")"
    )
