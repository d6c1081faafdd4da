"""Content-stream tokenizer (reference: PDFBox's parser feeding
``PDFBoxTree.processOperator``, PDFBoxTree.java:410-542).

Two tiers, dispatched per fragment:

- **fast path** — one compiled-regex scan (C-speed ``finditer``) for
  fragments with only the simple token surface (numbers, ``/Name``,
  flat ``(string)`` literals with simple escapes, ``[...]`` arrays,
  operators). All synthetic corpora hit this path.
- **full scanner** — PDFBox-lexer-complete handling for anything the fast
  regex cannot express, engaged when the fragment contains ``%``/``<``/
  octal escapes/nested parens:
    * nested unescaped parens in literals: ``(a(b)c)`` is one string,
    * octal escapes ``\\ddd`` (1-3 digits, mod 256) and line continuations,
    * hex strings ``<48656C6C6F>`` (whitespace ignored, odd length padded
      with 0; bytes mapped via chr — the synthetic stand-in for the
      reference's font-encoding unicode lookup),
    * comments ``%...`` to end of line,
    * ``<<...>>`` dictionaries consumed as opaque balanced blocks (their
      operands are dropped, like PDFBox operands consumed by unsupported
      operators),
    * unknown bytes skipped (PDFBox recovers at the next lexeme).

Unknown *operators* are emitted as normal ``(op, args)`` pairs; the
interpreter's dispatch ignores names it does not know — the guarded
fallthrough the reference gets from its processOperator switch.

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
    re.VERBOSE | re.DOTALL,
)

# any of: comment, hex/dict open, octal escape, line continuation, raw CR
# (in-literal EOL normalization), nested '(' inside a literal
_NEEDS_FULL_RE = re.compile(
    r"[%<\r]|\\[0-7\n]|\((?:\\.|[^\\()])*\(", re.DOTALL)

_NAME_RE = re.compile(r"/[^\s/\[\]()<>{}%]*")
_NUM_RE = re.compile(r"[-+]?(?:\d+\.\d*|\.\d+|\d+)")
_OP_RE = re.compile(r"[A-Za-z'\"][A-Za-z0-9*'\"]*")
_WS = " \t\r\n\f\x00"

class PdfName(str):
    """A /Name operand. Subclassing str keeps every existing consumer
    working (equality, hashing, str() all behave like the bare name), but
    lets operator handlers mirror PDFBox's COSName-vs-COSString operand
    typing: Tf and Do require a NAME, show operators require a STRING —
    a damaged stream putting one where the other belongs is skipped,
    exactly like the reference's instanceof checks."""
    __slots__ = ()


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


_SIMPLE_LIT_RE = re.compile(r"\(([^()\\\r]*)\)")


def _scan_literal(s: str, pos: int) -> tuple[str, int]:
    """Balanced (string) literal starting at s[pos] == '(': PDF escapes,
    octal codes, line continuations, nested unescaped parens."""
    # fast path: no escapes, no nesting, no CR normalization — the body is
    # the literal verbatim (the overwhelmingly common shape)
    m = _SIMPLE_LIT_RE.match(s, pos)
    if m is not None:
        return m.group(1), m.end()
    depth = 1
    i = pos + 1
    n = len(s)
    out: list[str] = []
    while i < n and depth:
        c = s[i]
        if c == "\\":
            nxt = s[i + 1] if i + 1 < n else ""
            # NB: the nxt checks below must guard against "" (backslash as
            # the last byte of a truncated stream): "" is a substring of
            # every string, so a bare `nxt in "01234567"` would take the
            # octal branch and crash on int("", 8)
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt and nxt in "01234567":
                j = i + 1
                while j < n and j < i + 4 and s[j] in "01234567":
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
            elif nxt and nxt in "\r\n":  # line continuation
                i += 2
                if nxt == "\r" and i < n and s[i] == "\n":
                    i += 1
            else:
                out.append(nxt)
                i += 2
        elif c == "(":
            depth += 1
            out.append(c)
            i += 1
        elif c == ")":
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        elif c == "\r":
            # PDF 32000-1 7.3.4.2: an in-literal end-of-line marker (CR,
            # LF, or CRLF) reads as a SINGLE 0x0A byte
            out.append("\n")
            i += 1
            if i < n and s[i] == "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out), i


def _scan_hex(s: str, pos: int) -> tuple[str, int]:
    """<hex> string starting at s[pos] == '<'."""
    e = s.find(">", pos)
    if e == -1:
        e = len(s)
    body = re.sub(r"\s", "", s[pos + 1:e])
    body = "".join(c for c in body if c in "0123456789abcdefABCDEF")
    if len(body) % 2:
        body += "0"
    return ("".join(chr(int(body[i:i + 2], 16))
                    for i in range(0, len(body), 2)),
            min(e + 1, len(s)))


def _skip_dict(s: str, pos: int) -> int:
    """Balanced << ... >> block starting at s[pos:pos+2] == '<<'; literals,
    hex strings, and %-comments inside are skipped opaquely (a '>>' inside
    any of them must not terminate the block)."""
    depth = 0
    i = pos
    n = len(s)
    while i < n:
        if s.startswith("<<", i):
            depth += 1
            i += 2
        elif s.startswith(">>", i):
            depth -= 1
            i += 2
            if depth <= 0:
                break
        elif s[i] == "(":
            _, i = _scan_literal(s, i)
        elif s[i] == "<":
            _, i = _scan_hex(s, i)
        elif s[i] == "%":
            nl = [x for x in (s.find("\n", i), s.find("\r", i)) if x != -1]
            i = min(nl) + 1 if nl else n
        else:
            i += 1
    return i


def _tokenize_full(fragment: str) -> list[tuple[str, list]]:
    ops: list[tuple[str, list]] = []
    args: list = []
    arr: list | None = None
    pos, n = 0, len(fragment)
    while pos < n:
        c = fragment[pos]
        if c in _WS:
            pos += 1
        elif c == "%":  # comment to end of line
            nl = [x for x in (fragment.find("\n", pos),
                              fragment.find("\r", pos)) if x != -1]
            pos = min(nl) + 1 if nl else n
        elif c == "(":
            s, pos = _scan_literal(fragment, pos)
            (arr if arr is not None else args).append(s)
        elif fragment.startswith("<<", pos):
            pos = _skip_dict(fragment, pos)  # dict operand: consumed, dropped
        elif c == "<":
            s, pos = _scan_hex(fragment, pos)
            (arr if arr is not None else args).append(s)
        elif c == "[":
            arr = []
            pos += 1
        elif c == "]":
            args.append(arr if arr is not None else [])
            arr = None
            pos += 1
        elif c == "/":
            m = _NAME_RE.match(fragment, pos)
            args.append(PdfName(m.group(0)[1:]))
            pos = m.end()
        else:
            m = _NUM_RE.match(fragment, pos)
            if m:
                (arr if arr is not None else args).append(float(m.group(0)))
                pos = m.end()
                continue
            m = _OP_RE.match(fragment, pos)
            if m:
                ops.append((m.group(0), args))
                args = []
                pos = m.end()
                continue
            pos += 1  # unknown byte: skip, resync at the next lexeme
    return ops


# Memo for short fragments: real corpora repeat graphics/state fragments
# heavily ("Q", "q ... cm" placements, per-page rect ops drawn from small
# literal sets — measured 50%+ of fragment tokenize calls are repeats).
# Safe because token lists are read-only downstream (the interpreter and
# doc_tokens only iterate/read operands); bounded like _HEX_CACHE.
_MEMO_MAX_LEN = 256
_MEMO_MAX_ENTRIES = 32768
_memo: dict[str, list] = {}


def tokenize(fragment: str) -> list[tuple[str, list]]:
    """Scan one content-stream fragment into (operator, operands) pairs.

    Operands accumulate until an operator token flushes them
    (mirrors PDFBox's operand-stack dispatch into processOperator).
    """
    if len(fragment) <= _MEMO_MAX_LEN:
        hit = _memo.get(fragment)
        if hit is None:
            hit = _tokenize_uncached(fragment)
            if len(_memo) < _MEMO_MAX_ENTRIES:
                _memo[fragment] = hit
        return hit
    return _tokenize_uncached(fragment)


def _tokenize_uncached(fragment: str) -> list[tuple[str, list]]:
    if _NEEDS_FULL_RE.search(fragment) is not None:
        return _tokenize_full(fragment)
    ops: list[tuple[str, list]] = []
    args: list = []
    arr: list | None = None
    # findall yields one 6-tuple per token; exactly one group participates
    # per match and none can match the empty string, so truthiness IS the
    # dispatch — no match objects, no group() calls in the hot loop
    for num, name, sstr, lbrk, _rbrk, opname in _TOKEN_RE.findall(fragment):
        if num:
            (arr if arr is not None else args).append(float(num))
        elif opname:
            ops.append((opname, args))
            args = []
        elif sstr:
            s = _unescape(sstr[1:-1])
            (arr if arr is not None else args).append(s)
        elif name:
            args.append(PdfName(name[1:]))
        elif lbrk:
            arr = []
        else:  # rbrk
            args.append(arr if arr is not None else [])
            arr = None
    return ops
