"""Minimal pure-Python PDF text extraction (stdlib only).

Upgrades the kernel's ``%PDF`` path from an explicit stub to a real
extractor for the common simple case: uncompressed or FlateDecode content
streams with standard text operators. The goal is the reference's per-page
semantics (/root/reference/app/utils/pdf_utils.py page model + the OCR
text-per-page contract) without any external PDF library:

- objects are located by scanning ``N G obj ... endobj`` (no xref needed —
  robust to linearized/appended files),
- page objects (``/Type /Page``) are taken in document order; their
  ``/Contents`` streams (direct or array of refs) are concatenated,
- content streams are decoded (``/FlateDecode`` via zlib, else raw) and fed
  through a tiny text-operator machine: BT/ET, Td/TD/T*/Tm positioning
  (translation components only), Tj/'/" literal strings, TJ arrays, with
  PDF string escapes and hex strings,
- each shown string becomes a positioned run ``(page, x, y, text)`` and the
  shared ``pdf_layout.reconstruct_layout`` turns runs into reading order —
  the same path the %FAKEPDF payloads use, so normalization and page
  joining are identical.

Out of scope (documented, error-as-data at the kernel boundary): CID/Type0
composite fonts with custom CMaps, encrypted documents, object streams
(``/ObjStm``), and non-Flate filters. Real Common-Crawl PDF coverage needs
a full parser; this handles the simple-PDF class end-to-end and keeps the
operator contract real.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

# Text-showing / positioning operators inside BT..ET.
_TOKEN_RE = re.compile(
    rb"""
    \((?:\\.|[^\\()])*\)      # literal string (with escapes)
  | <[0-9A-Fa-f\s]*>          # hex string
  | \[|\]
  | /[^\s\[\]()<>/]*          # name
  | [-+]?[0-9]*\.?[0-9]+      # number
  | [A-Za-z'"*]+              # operator
    """,
    re.VERBOSE,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> str:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex(tok: bytes) -> str:
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1")


def _decode_stream(obj_body: bytes) -> bytes | None:
    m = _STREAM_RE.search(obj_body)
    if not m:
        return None
    raw = m.group(1)
    if b"/FlateDecode" in obj_body:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in obj_body.split(b"stream", 1)[0]:
        return None  # unsupported filter
    return raw


def _content_runs(content: bytes, page_no: int) -> list[dict]:
    """Run the text-operator machine over one page's content stream."""
    runs: list[dict] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td/TD are relative to it)
    leading = 0.0
    in_text = False
    stack: list[bytes] = []

    def shown(s: str) -> None:
        if s:
            runs.append({"page": page_no, "x": x, "y": -y, "text": s})
            # y negated: PDF y grows upward, reconstruct_layout sorts by
            # ascending y as reading order (top line first).

    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok == b"BT":
            in_text = True
            x = y = lx = ly = 0.0
            stack.clear()
            continue
        if tok == b"ET":
            in_text = False
            stack.clear()
            continue
        if not in_text:
            continue
        if tok[:1] in b"([<" and tok[:1] != b"[":
            stack.append(tok)
            continue
        if tok in (b"[", b"]") or tok[:1] == b"/":
            continue
        if re.fullmatch(rb"[-+]?[0-9]*\.?[0-9]+", tok):
            stack.append(tok)
            continue
        # operator
        if tok in (b"Td", b"TD"):
            if len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
                if tok == b"TD":
                    leading = -ty
            stack.clear()
        elif tok == b"Tm":
            if len(stack) >= 6:
                lx, ly = float(stack[-2]), float(stack[-1])
                x, y = lx, ly
            stack.clear()
        elif tok == b"T*":
            ly -= leading
            x, y = lx, ly
            stack.clear()
        elif tok == b"Tj":
            if stack and stack[-1][:1] in (b"(", b"<"):
                s = stack[-1]
                shown(_decode_literal(s) if s[:1] == b"(" else _decode_hex(s))
            stack.clear()
        elif tok in (b"'", b'"'):
            ly -= leading
            x, y = lx, ly
            if stack and stack[-1][:1] in (b"(", b"<"):
                s = stack[-1]
                shown(_decode_literal(s) if s[:1] == b"(" else _decode_hex(s))
            stack.clear()
        elif tok == b"TJ":
            parts = [
                _decode_literal(s) if s[:1] == b"(" else _decode_hex(s)
                for s in stack
                if s[:1] in (b"(", b"<")
            ]
            shown("".join(parts))
            stack.clear()
        elif tok == b"TL":
            if stack:
                leading = float(stack[-1])
            stack.clear()
        else:
            stack.clear()
    return runs


def extract_pdf_runs(payload: bytes) -> list[dict]:
    """Parse a real PDF byte stream into positioned text runs.

    Raises ``ValueError`` for documents this minimal parser cannot handle
    (encrypted, CID fonts, object streams) — the kernel converts that into
    an error-as-data row (X7), never a task failure.
    """
    if b"/Encrypt" in payload:
        raise ValueError("encrypted PDF not supported by the minimal parser")
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        objects[int(m.group(1))] = m.group(3)

    pages = [
        (num, body)
        for num, body in sorted(objects.items())
        if _PAGE_RE.search(body.split(b"stream", 1)[0])
    ]
    if not pages:
        raise ValueError("no /Type /Page objects found")

    runs: list[dict] = []
    for page_no, (_, body) in enumerate(pages, start=1):
        content_ids: list[int] = []
        arr = _CONTENTS_ARR_RE.search(body)
        if arr:
            content_ids = [int(g) for g in _REF_RE.findall(arr.group(1))]
        else:
            ref = _CONTENTS_REF_RE.search(body)
            if ref:
                content_ids = [int(ref.group(1))]
        content = b""
        for cid in content_ids:
            decoded = _decode_stream(objects.get(cid, b""))
            if decoded:
                content += decoded + b"\n"
        if not content:
            inline = _decode_stream(body)
            if inline:
                content = inline
        runs.extend(_content_runs(content, page_no))
    if not runs:
        raise ValueError("no extractable text runs (unsupported encoding?)")
    return runs
