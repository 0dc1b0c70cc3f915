"""Real-PDF text extraction: minimal parser over hand-built PDF bytes.

The PDFs are constructed in-test (stdlib only, deterministic) so the
parser is exercised against genuine %PDF structure: xref-free object scan,
Flate and raw content streams, multi-page /Contents, Td/TD/Tm/T*
positioning, Tj/TJ/' strings with escapes and hex.
"""

from __future__ import annotations

import zlib

import pytest

from ocr_parallel_spark.kernel.extract import extract_payload
from ocr_parallel_spark.kernel.pdf_layout import extract_pdf
from ocr_parallel_spark.kernel.pdf_parse import extract_pdf_runs


def build_pdf(page_streams: list[bytes], compress: bool = False) -> bytes:
    """Assemble a minimal but structurally-real PDF."""
    objs: list[bytes] = []
    n_pages = len(page_streams)
    page_ids = [3 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        b"2 0 obj\n<< /Type /Pages /Kids [" + kids + b"] /Count %d >>\nendobj\n" % n_pages
    )
    for i, stream in enumerate(page_streams):
        pid, cid = page_ids[i], page_ids[i] + 1
        objs.append(
            b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
            b"/MediaBox [0 0 612 792] >>\nendobj\n" % (pid, cid)
        )
        data = zlib.compress(stream) if compress else stream
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (cid, filt, len(data))
            + data
            + b"\nendstream\nendobj\n"
        )
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


PAGE1 = (
    b"BT /F1 12 Tf 72 720 Td (Hello world) Tj "
    b"0 -20 Td [(from ) (a TJ array)] TJ ET"
)
PAGE2 = b"BT 72 700 Td (Second page line one) Tj T* ET BT 72 650 Td (lower line) Tj ET"


def test_runs_positions_and_pages():
    pdf = build_pdf([PAGE1, PAGE2])
    runs = extract_pdf_runs(pdf)
    by_page = {}
    for r in runs:
        by_page.setdefault(r["page"], []).append(r)
    assert set(by_page) == {1, 2}
    texts1 = [r["text"] for r in sorted(by_page[1], key=lambda r: r["y"])]
    assert texts1 == ["Hello world", "from a TJ array"]  # top line first


def test_extract_pdf_reading_order_and_normalization():
    pdf = build_pdf([PAGE1, PAGE2])
    out = extract_pdf(pdf)
    assert out["text"] == (
        "Hello world from a TJ array\n\nSecond page line one lower line"
    )
    assert out["n_blocks_total"] == 2  # pages are the block unit


def test_flate_compressed_stream():
    pdf = build_pdf([PAGE1], compress=True)
    out = extract_pdf(pdf)
    assert out["text"] == "Hello world from a TJ array"


def test_string_escapes_and_hex():
    page = (
        rb"BT 72 720 Td (paren \( inside \) and \134 backslash) Tj "
        b"0 -20 Td <48657820737472696E67> Tj ET"
    )
    runs = extract_pdf_runs(build_pdf([page]))
    texts = [r["text"] for r in sorted(runs, key=lambda r: r["y"])]
    assert texts[0] == "paren ( inside ) and \\ backslash"
    assert texts[1] == "Hex string"


def test_unsupported_pdf_is_error_as_data():
    encrypted = b"%PDF-1.7\n1 0 obj\n<< /Encrypt 5 0 R >>\nendobj\n"
    with pytest.raises(ValueError):
        extract_pdf_runs(encrypted)
    rec = extract_payload(encrypted)
    assert rec["status"] == "error"
    assert rec["text"] is None


def test_kernel_routes_real_pdf():
    rec = extract_payload(build_pdf([PAGE1, PAGE2], compress=True))
    assert rec["status"] == "found" and rec["error_type"] is None
    assert "Hello world from a TJ array" in rec["text"]
    assert rec["n_blocks_total"] == 2  # two pages
