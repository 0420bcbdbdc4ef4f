"""X3: cleanup of list-like free text emitted by non-schema-constrained LLMs.

The reference's legacy llama-1 path returned unconstrained prose; its
``cleanup_presenting_sx`` (``/root/reference/llacie/text_wrangling.py:17-77``)
recovers a clean mention list from four list dialects — LaTeX ``itemize``,
``1) ... 2) ...`` numbered lists, bulleted lists, and inline comma/and lists —
then strips parentheticals, re-splits compound items, and drops negations /
letterless junk. Any raw-text LLM backend plugged into ``LLMScorer`` needs
exactly this post-processing, so it lives behind the scorer seam as an
optional raw-output adapter (see ``scorer.LLMScorer(raw_output=True)``).

The detection/split regexes below are a declared behavior-compatible
transcription of the reference's (they *are* the dialect spec, verified by
tests/test_listclean.py parity cases); everything around them — list output,
Spark batch adapter — is new.
"""

from __future__ import annotations

import re

_NUMBERED = re.compile(r"[1]([).]) +.+?([;,]?) [2]\1( +.+?(\2 |\2? and )\d+\1)*")
_BULLETED = re.compile(r"([·•*-] ?)[^\n]+(\n\n?)\1\S")
_LATEX_OPEN = re.compile(r"^\\begin\{itemize\}\s+\\item +")
_LATEX_ITEM = re.compile(r"\s+\\item +")
_LATEX_CLOSE = re.compile(r"\s+\\end\{itemize\}[\s\S]*")
_NEGATION = re.compile(r"No\s+", re.IGNORECASE)
_PARENTHETICAL = re.compile(r"\s*[(][^)]+[)]")
_ITEM_SPLIT = re.compile(r"[;,] (?:and )?|[;,]? and | */ *(?=[a-zA-Z]{2})|\n")


def split_listlike_text(raw: str) -> list[str] | None:
    """Split one LLM response into coarse list items, or None when the text
    is not recognizably a list (reference split_listlike_text semantics)."""
    numbered = _NUMBERED.match(raw)
    bulleted = _BULLETED.match(raw)

    if raw.startswith("\\begin{itemize}"):
        middle = _LATEX_CLOSE.sub("", _LATEX_OPEN.sub("", raw))
        return _LATEX_ITEM.split(middle)

    if numbered is not None:
        mark = numbered[1]  # ')' or '.'
        sep = numbered[2]  # ';' / ',' / ''
        # cut the trailing prose after the list body: sentence end for ')'
        # style, paragraph break otherwise
        end_re = r"([.]\s+|\n\n)" if mark == ")" else r"[.]?\n\n"
        body = raw
        tail = re.search(end_re, raw[numbered.end():])
        if tail is not None:
            body = raw[: numbered.end() + tail.start()]
        middle = re.sub(r"^\d[" + mark + r"]", "", body)
        if sep:
            item_re = r"(?:" + sep + r"|" + sep + r"? and)? \d+[" + mark + r"]"
        else:
            item_re = r"(?: and)? \d+[" + mark + r"]"
        return re.split(item_re, middle)

    if bulleted is not None:
        bullet_re = r"[" + bulleted[1][0] + r"]" + bulleted[1][1:]
        without_prefix = re.sub(r"^" + bullet_re, "", raw)
        middle = re.sub(r"\n\n[^" + bulleted[1][0] + r"][\s\S]*", "", without_prefix)
        return re.split(bulleted[2] + bullet_re, middle)

    # fall back to an inline list within the first sentence; excise a stray
    # leading bullet/number first
    first = re.sub(r"^(1[.)]|[·•*-])\s+", "", raw)
    first = re.sub(r"([.]\s+|[.]?\n\n)[\s\S]*", "", first)
    if re.search(r"([;,]) \S+.*(\1|\1? and) \S", first) is None:
        return None  # not plausibly a list of >= 3 items: abort
    return re.split(r"[;,] (?:and )?|[;,]? and ", first)


def cleanup_mention_list(raw: str | None) -> list[str] | None:
    """Raw list-like LLM output -> clean mention list (cleanup_presenting_sx
    semantics; returns a list rather than the reference's joined string so
    Spark callers get an array column directly). None = unparseable."""
    if raw is None:
        return None
    values = split_listlike_text(raw)
    if values is None:
        return None
    values = [_PARENTHETICAL.sub("", v) for v in values]
    # drop whole negated items before re-splitting compounds
    values = [v for v in values if _NEGATION.match(v) is None]
    values = [p.strip(" -.") for v in values for p in _ITEM_SPLIT.split(v)]
    return [
        v for v in values
        if v and _NEGATION.match(v) is None and re.search(r"[a-z]", v, re.IGNORECASE)
    ]
