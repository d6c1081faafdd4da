"""Content-stream tokenizer (reference: PDFBox's parser feeding
``PDFBoxTree.processOperator``, PDFBoxTree.java:410-542).

One compiled-regex scan per fragment (C-speed ``finditer``), producing
``(op, args)`` tuples. Operand kinds: numbers, ``/Name`` tokens, ``(string)``
literals (with backslash escapes; nested unescaped parens are not needed by
the synthetic corpus), and one-level ``[ ... ]`` arrays for ``TJ``.

The synthetic corpus adds one pseudo-operator not in PDF:
``w h rot PG`` — page boundary carrying the page box + rotation (the
reference gets these from ``PDPage.getCropBox()/getRotation()``,
PDFBoxTree.java:797-801,831-855).
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
    (?P<num>[-+]?(?:\d+\.\d*|\.\d+|\d+))
  | (?P<name>/[^\s/\[\]()<>{}%]*)
  | (?P<str>\((?:\\.|[^\\()])*\))
  | (?P<lbrk>\[)
  | (?P<rbrk>\])
  | (?P<op>[A-Za-z'"][A-Za-z0-9*'"]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _unescape(body: str) -> str:
    if "\\" not in body:
        return body
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            nxt = body[i + 1]
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(fragment: str) -> list[tuple[str, list]]:
    """Scan one content-stream fragment into (operator, operands) pairs.

    Operands accumulate until an operator token flushes them
    (mirrors PDFBox's operand-stack dispatch into processOperator).
    """
    ops: list[tuple[str, list]] = []
    args: list = []
    arr: list | None = None
    for m in _TOKEN_RE.finditer(fragment):
        kind = m.lastgroup
        if kind == "num":
            v = float(m.group("num"))
            (arr if arr is not None else args).append(v)
        elif kind == "name":
            args.append(m.group("name")[1:])
        elif kind == "str":
            s = _unescape(m.group("str")[1:-1])
            (arr if arr is not None else args).append(s)
        elif kind == "lbrk":
            arr = []
        elif kind == "rbrk":
            args.append(arr if arr is not None else [])
            arr = None
        else:  # operator
            ops.append((m.group("op"), args))
            args = []
    return ops
