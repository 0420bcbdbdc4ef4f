"""Concept vocabulary: n-gram gazetteer with longest-match-first ("backoff") lookup.

Re-implements the matching *semantics* of the reference's vocabulary matcher
(``/root/reference/llacie/vocab.py:86-121``) on top of a plain tabular concept
dictionary, so the same surface text always yields the same canonical terms:

- every row maps an ``ngram`` surface form (1..N space-joined lowercase tokens)
  to a ``canonical_name``, optionally emitting a second ``combo_symptom`` term;
- matching scans each line of a mention list, tokenizing with
  ``[^a-z0-9]+ -> ' '`` then splitting on whitespace, and greedily consumes the
  longest matching n-gram starting at the current token (n from N down to 1),
  advancing one token when nothing matches;
- lines are visited last-to-first so the *earliest* line number wins for a term
  seen on several lines (reference behavior: later assignments overwrite).

The vocabulary is tiny (~1k rows) relative to the corpus, so in Spark jobs it
is broadcast — either as these plain dicts captured inside a pandas UDF, or as
a broadcast-hash-joined DataFrame in the relational linking variant
(see ``operators/linking.py``).
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass, field

_TOKEN_CLEAN = re.compile(r"[^a-z0-9]+")
_WS = re.compile(r"\s+")


@dataclass
class Vocab:
    """An n-gram concept dictionary with longest-first lookup tables."""

    # ngram_dicts[0] holds the longest n-grams; ngram_dicts[-1] the unigrams.
    ngram_dicts: list[dict[tuple[str, ...], list[str]]] = field(default_factory=list)
    # canonical term -> set of surface synonyms (incl. itself)
    term_synonyms: dict[str, set[str]] = field(default_factory=dict)

    @property
    def terms(self) -> list[str]:
        """All canonical terms, sorted (synonyms excluded)."""
        return sorted(self.term_synonyms.keys())

    @property
    def max_n(self) -> int:
        return len(self.ngram_dicts)

    def __contains__(self, term: str) -> bool:
        return term in self.term_synonyms

    def __len__(self) -> int:
        return len(self.term_synonyms)

    # ------------------------------------------------------------------ build

    @classmethod
    def from_rows(cls, rows: list[dict]) -> "Vocab":
        """Build from dict rows with keys ngram/n/canonical_name/combo_symptom.

        Rows are grouped by ``n`` descending, mirroring the reference parse
        (``llacie/vocab.py:86-96``): every row contributes, and a non-empty
        ``combo_symptom`` makes the n-gram emit two canonical terms.
        """
        vocab = cls()
        ns = sorted({int(r["n"]) for r in rows}, reverse=True)
        max_n = ns[0] if ns else 0
        for n in range(max_n, 0, -1):
            d: dict[tuple[str, ...], list[str]] = {}
            for r in rows:
                if int(r["n"]) != n:
                    continue
                combo = (r.get("combo_symptom") or "").strip()
                terms = [r["canonical_name"]]
                if combo:
                    terms.append(combo)
                for t in terms:
                    vocab.term_synonyms.setdefault(t, {t}).add(r["ngram"])
                d[tuple(r["ngram"].split(" "))] = terms
            vocab.ngram_dicts.append(d)
        return vocab

    @classmethod
    def from_csv(cls, path: str) -> "Vocab":
        with open(path, newline="") as f:
            return cls.from_rows(list(csv.DictReader(f)))

    @classmethod
    def from_xlsx(cls, path: str, sheet: str | None = None) -> "Vocab":
        """Load directly from the reference's workbook artifact
        (``llacie/vocab.py:86-97`` reads the same sheet with read_excel) —
        stdlib zip+XML reader, no openpyxl needed. Rows with an empty
        ``ngram`` (padding/blank lines in the sheet) are dropped."""
        from llacie_spark.xlsx import read_rows

        rows = [
            {k: ("" if v is None else str(v)) if k != "n" else v for k, v in r.items()}
            for r in read_rows(path, sheet=sheet)
            if r.get("ngram") not in (None, "") and r.get("n") not in (None, "")
        ]
        return cls.from_rows(rows)

    def to_rows(self) -> list[dict]:
        """Flatten back to (ngram, n, canonical_name, combo_symptom, emit_order)
        rows — the relational form used by the broadcast-join linking variant."""
        out = []
        for i, d in enumerate(self.ngram_dicts):
            n = len(self.ngram_dicts) - i
            for ngram, terms in d.items():
                for j, t in enumerate(terms):
                    out.append(
                        {
                            "ngram": " ".join(ngram),
                            "n": n,
                            "canonical_name": t,
                            "emit_order": j,
                        }
                    )
        return out

    # ------------------------------------------------------------------ match

    @staticmethod
    def tokenize_line(line: str) -> list[str]:
        """Lowercase, strip non-alphanumerics to spaces, split on whitespace.

        Matches the reference tokenizer (``llacie/vocab.py:110``) exactly —
        including the quirk that an empty/symbol-only line yields [''].
        """
        return _WS.split(_TOKEN_CLEAN.sub(" ", line.lower()).strip())

    def find_terms(self, feature_value: str) -> dict[str, int]:
        """Greedy longest-n-gram-first matching over a newline-joined mention
        list; returns {canonical term: earliest 1-based line number}.

        Semantics-equal to ``llacie/vocab.py:100-121``: lines are scanned in
        reverse so earlier lines overwrite later ones; a match consumes its n
        tokens; a miss advances one token.
        """
        lines = feature_value.split("\n")
        found: dict[str, int] = {}
        # index-based scan (r07): same greedy longest-first walk, but the
        # cursor advances by index instead of repeatedly re-slicing/popping
        # the token list (tokens[n:] / pop(0) were O(line length) each)
        dicts = self.ngram_dicts
        max_n = len(dicts)
        for line_no in range(len(lines) - 1, -1, -1):
            tokens = self.tokenize_line(lines[line_no])
            n_tok = len(tokens)
            pos = 0
            while pos < n_tok:
                hit = None
                for i, d in enumerate(dicts):
                    n = max_n - i
                    hit = d.get(tuple(tokens[pos : pos + n]))
                    if hit is None:
                        continue
                    for term in hit:
                        found[term] = line_no + 1
                    pos += n
                    break
                if hit is None:
                    pos += 1
        return found
