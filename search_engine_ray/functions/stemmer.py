"""Porter stemmer (classic algorithm, Porter 1980).

Reimplements the semantics of the reference engine's stemmer
(``/root/reference/src/cis5550/tools/Stemmer.java:47-361`` — Martin
Porter's canonical Java implementation, including the later ``bli``->
``ble`` and ``logi``->``log`` revisions) as fresh Python. Words of
length <= 2 are returned unchanged (the ``k > 1`` guard in
``Stemmer.java:357-361``). Input is expected to be lowercase.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _Porter:
    """One stemming pass over a word held in a char list buffer.

    ``b`` is the buffer, ``k`` the index of the last char of the current
    word, ``j`` a scratch index (end of the candidate stem).
    """

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        # number of consonant sequences in b[0..j]
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if self.b[o : o + l] != list(s):
            return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1ab(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step1c(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    _STEP2 = {
        # keyed by b[k-1]; ordered suffix -> replacement rules
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step2(self) -> None:
        if self.k == 0:
            return
        for suf, rep in self._STEP2.get(self.b[self.k - 1], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP3 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step3(self) -> None:
        for suf, rep in self._STEP3.get(self.b[self.k], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP4 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "o": ("ion", "ou"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step4(self) -> None:
        if self.k == 0:
            return
        for suf in self._STEP4.get(self.b[self.k - 1], ()):
            if self._ends(suf):
                if suf == "ion" and not (self.j >= 0 and self.b[self.j] in ("s", "t")):
                    continue
                if self._m() > 1:
                    self.k = self.j
                return

    def _step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self) -> str:
        if self.k > 1:
            self._step1ab()
            self._step1c()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
        return "".join(self.b[: self.k + 1])


def porter_stem(word: str) -> str:
    """Stem one lowercase word; words of length <= 2 are unchanged."""
    if len(word) <= 2:
        return word
    return _Porter(word).stem()


class CachingStemmer:
    """Memoizing stemmer for vectorized batch use.

    Vocabulary is heavily repeated across batches (Zipf), so a dict
    cache amortizes per-word cost to a lookup; hold one instance per
    actor (``__init__``-time state) and reuse across batches.
    """

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, word: str) -> str:
        out = self._cache.get(word)
        if out is None:
            out = porter_stem(word)
            self._cache[word] = out
        return out

    def stem_many(self, words: list[str]) -> list[str]:
        cache = self._cache
        out = []
        append = out.append
        for w in words:
            s = cache.get(w)
            if s is None:
                s = porter_stem(w)
                cache[w] = s
            append(s)
        return out
