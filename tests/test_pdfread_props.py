"""Property tests for the PDF object parser (pdfread.parse_obj).

A serializer for arbitrary object trees (dicts, arrays, names with #-hex
escapes, literal and hex strings, numbers, refs, booleans, null) writes
spec-shaped bytes; parse_obj must recover the identical tree. This is the
lexer-level robustness evidence for the real-file reader — the fixtures
exercise real-world shapes, hypothesis exercises the adversarial ones.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_spark.pdfread import Name, Ref, parse_obj

_DELIMS = set(b"()<>[]{}/%#")
_WS = set(b"\x00\t\n\x0c\r ")


def _ser_name(n: str) -> bytes:
    out = bytearray(b"/")
    for b in n.encode("latin-1"):
        if b in _DELIMS or b in _WS or b < 33 or b > 126:
            out += b"#%02X" % b
        else:
            out.append(b)
    return bytes(out)


def _ser_literal(s: bytes) -> bytes:
    out = bytearray(b"(")
    for b in s:
        if b in (0x5C, 0x28, 0x29):
            out += b"\\" + bytes([b])
        elif b in (0x0D,):  # CR normalizes to LF on read: write as octal
            out += b"\\015"
        else:
            out.append(b)
    return bytes(out) + b")"


def _ser(o, hex_strings: bool) -> bytes:
    if o is None:
        return b"null"
    if o is True:
        return b"true"
    if o is False:
        return b"false"
    if isinstance(o, Ref):
        return b"%d %d R" % o
    if isinstance(o, Name):
        return _ser_name(str(o))
    if isinstance(o, bool):
        return b"true" if o else b"false"
    if isinstance(o, int):
        return str(o).encode()
    if isinstance(o, float):
        return (f"{o:.6f}").encode()
    if isinstance(o, bytes):
        if hex_strings:
            return b"<" + o.hex().encode() + b">"
        return _ser_literal(o)
    if isinstance(o, list):
        return b"[ " + b" ".join(_ser(x, hex_strings) for x in o) + b" ]"
    if isinstance(o, dict):
        parts = []
        for k, v in o.items():
            parts.append(_ser_name(k) + b" " + _ser(v, hex_strings))
        return b"<< " + b" ".join(parts) + b" >>"
    raise TypeError(type(o))


_names = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=255),
    min_size=1, max_size=12).map(Name)

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-10**9, max_value=10**9),
    # multiples of 1/64: exact in binary AND in %.6f decimal, so the
    # serialize -> float() round trip is identity
    st.integers(min_value=-64 * 10**4, max_value=64 * 10**4)
    .map(lambda i: i / 64.0),
    st.binary(max_size=32),
    _names,
    st.tuples(st.integers(min_value=0, max_value=10**5),
              st.integers(min_value=0, max_value=65535)).map(Ref),
)

_objects = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=5),
        st.dictionaries(st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=8), kids, max_size=5),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(_objects, st.booleans())
def test_parse_obj_round_trips(obj, hex_strings):
    data = _ser(obj, hex_strings)
    got, end = parse_obj(data, 0)
    assert end == len(data)
    assert got == obj


@settings(max_examples=100, deadline=None)
@given(st.lists(_objects, min_size=1, max_size=6))
def test_parse_obj_sequences(objs):
    """Concatenated objects parse back one by one — the int-int-R
    indirect-reference lookahead must never steal operands from a
    neighbouring object."""
    data = b"  ".join(_ser(o, True) for o in objs)
    pos = 0
    out = []
    for _ in objs:
        o, pos = parse_obj(data, pos)
        out.append(o)
    assert out == objs


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_literal_strings_round_trip_all_bytes(payload):
    got, end = parse_obj(_ser_literal(payload), 0)
    assert got == payload
