"""Word algebra for iterated-sums signatures (ISS).

A *word* is a sequence of *extended letters*; an extended letter is an
integer exponent vector over the input dimensions.  The string syntax is
the one used by the reference library (``/root/reference/fruits/iss/words/
word.py:166-245``): ``"[11][12]"`` means two extended letters, the first
squaring dimension 1, the second multiplying dimensions 1 and 2.  Multi
-digit dimensions are parenthesised (``"[(10)2]"``) and negative digits
denote negative exponents (``"[-1-12]"`` -> dim1 exponent -2, dim2
exponent +1).

This module is pure Python/NumPy, used at *plan time* only (driver side);
nothing here touches Spark.  The implementation is original: words are
canonicalised to ``(k, d)`` int32 exponent matrices and the prefix-CSE
plan is computed with a hash set of letter-tuple prefixes instead of the
reference's quadratic string search (``/root/reference/fruits/iss/
cache.py:17-37`` defines the semantics our plan must reproduce).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

import numpy as np

_WORD_RE = re.compile(r"(\[(-?\d|\(-?\d+\))+\])+")
_EL_TOKEN_RE = re.compile(r"\((-?\d+)\)|(-?\d)")


def parse_word(word: str) -> np.ndarray:
    """Parse a word string into a ``(k, d)`` int32 exponent matrix.

    ``k`` is the number of extended letters, ``d`` the highest dimension
    referenced anywhere in the word.  Entry ``[i, j]`` is the (signed)
    exponent of dimension ``j+1`` in the ``i``-th extended letter.
    """
    if not _WORD_RE.fullmatch(word):
        raise ValueError(f"invalid word string: {word!r}")
    letters: list[dict[int, int]] = []
    max_dim = 0
    for el_raw in word[1:-1].split("]["):
        counts: dict[int, int] = {}
        for m in _EL_TOKEN_RE.finditer(el_raw):
            val = int(m.group(1) if m.group(1) is not None else m.group(2))
            if val == 0:
                raise ValueError(f"dimension 0 not allowed in {word!r}")
            dim = abs(val)
            counts[dim] = counts.get(dim, 0) + (1 if val > 0 else -1)
            max_dim = max(max_dim, dim)
        letters.append(counts)
    out = np.zeros((len(letters), max_dim), dtype=np.int32)
    for i, counts in enumerate(letters):
        for dim, c in counts.items():
            out[i, dim - 1] = c
    return out


def word_string(mat: np.ndarray) -> str:
    """Inverse of :func:`parse_word` (canonical form, ascending dims)."""
    parts = []
    for row in mat:
        s = ""
        for dim, exp in enumerate(row, start=1):
            tok = str(dim) if dim < 10 else f"({dim})"
            neg = f"-{dim}" if dim < 10 else f"(-{dim})"
            s += (tok * exp) if exp >= 0 else (neg * (-exp))
        parts.append(f"[{s}]")
    return "".join(parts)


@dataclass(frozen=True)
class SimpleWord:
    """A word plus its per-letter weighting exponents ``alpha``.

    ``alpha`` defaults to ones (reference: ``words/word.py:71-76``) and is
    only consulted when a weighting is attached to the ISS.
    """

    string: str
    matrix: np.ndarray = field(compare=False, repr=False, default=None)  # type: ignore[assignment]
    alpha: tuple[float, ...] = ()

    def __post_init__(self) -> None:
        if self.matrix is None:
            object.__setattr__(self, "matrix", parse_word(self.string))
        if not self.alpha:
            object.__setattr__(
                self, "alpha", tuple(1.0 for _ in range(len(self.matrix)))
            )
        if len(self.alpha) != len(self.matrix):
            raise ValueError("alpha length must equal word length")

    def __len__(self) -> int:
        return len(self.matrix)

    def letters(self) -> tuple[tuple[int, ...], ...]:
        """Canonical letter tuples: trailing zero exponents trimmed so
        words over different max dimensions compare correctly."""
        out = []
        for row in self.matrix:
            t = tuple(int(x) for x in row)
            while t and t[-1] == 0:
                t = t[:-1]
            out.append(t)
        return tuple(out)

    def prefix(self, k: int) -> "SimpleWord":
        return SimpleWord(
            word_string(self.matrix[:k]), self.matrix[:k], self.alpha[:k]
        )


def W(s: str, alpha: tuple[float, ...] = ()) -> SimpleWord:
    """Shorthand constructor."""
    return SimpleWord(s, None, alpha)  # type: ignore[arg-type]


# ---------------------------------------------------------------------------
# word generation (reference: iss/words/creation.py:26-103)
# ---------------------------------------------------------------------------

def _partitions(n: int, start: int = 1):
    yield (n,)
    for i in range(start, n // 2 + 1):
        for p in _partitions(n - i, i):
            yield (i,) + p


def _els_of_weight(w: int, d: int) -> list[str]:
    out = []
    for combo in itertools.combinations_with_replacement(range(1, d + 1), w):
        s = "".join(str(x) if x < 10 else f"({x})" for x in combo)
        out.append(f"[{s}]")
    return out


def of_weight(w: int, dim: int = 1) -> tuple[SimpleWord, ...]:
    """All distinct words of total letter weight ``w`` over ``dim`` dims.

    Counts match the reference (``of_weight(n,1) == 2**(n-1)`` words,
    ``of_weight(4,2) == 82``, ``of_weight(6,2) == 956``).
    """
    by_weight = [_els_of_weight(i, dim) for i in range(1, w + 1)]
    words = []
    for partition in _partitions(w):
        for perm in set(itertools.permutations(partition)):
            for raw in itertools.product(*[by_weight[p - 1] for p in perm]):
                words.append(W("".join(raw)))
    return tuple(words)


def alternate_sign(words: list[SimpleWord]) -> list[SimpleWord]:
    """For each word emit the two alternating-sign variants
    (reference: ``creation.py:86-103``)."""
    out = []
    for w in words:
        v1, v2 = "", ""
        for i, row in enumerate(w.matrix):
            s = ""
            for dim, exp in enumerate(row, start=1):
                s += f"-{dim}" * int(exp)
            pos = s.replace("-", "")
            v1 += f"[{s}]" if i % 2 == 0 else f"[{pos}]"
            v2 += f"[{pos}]" if i % 2 == 0 else f"[{s}]"
        out.append(W(v1))
        out.append(W(v2))
    return out


# ---------------------------------------------------------------------------
# prefix-CSE plan (reference semantics: iss/cache.py:17-37)
# ---------------------------------------------------------------------------

class PrefixPlan:
    """Common-prefix elimination across a word list (EXTENDED mode).

    For word ``i``, ``depth(i)`` is the number of *new* prefix streams to
    compute: its total length minus the longest prefix shared with any
    earlier word.  One scan per word then emits exactly its ``depth``
    longest prefixes (the shorter shared ones were already emitted by an
    earlier word's scan).
    """

    def __init__(self, words: list[SimpleWord]) -> None:
        self.words = list(words)
        seen: set[tuple[tuple[int, ...], ...]] = set()
        self._depths: list[int] = []
        for w in self.words:
            letters = w.letters()
            shared = 0
            for j in range(1, len(letters) + 1):
                if letters[:j] in seen:
                    shared = j
                else:
                    break
            self._depths.append(len(letters) - shared)
            for j in range(1, len(letters) + 1):
                seen.add(letters[:j])

    def depth(self, i: int) -> int:
        return self._depths[i]

    def n_streams(self, indices=None) -> int:
        if indices is None:
            indices = range(len(self.words))
        return sum(self._depths[i] for i in indices)

    def labels(self) -> list[str]:
        """Stream labels in emission order: for each word its new
        prefixes, shortest first (matches reference stream ordering)."""
        out = []
        for w, d in zip(self.words, self._depths):
            k = len(w)
            for j in range(k - d + 1, k + 1):
                out.append(word_string(w.matrix[:j]))
        return out
