"""Layout-aware text reconstruction for PDF-style payloads.

Stands in for the reference's per-page PDF split + OCR path
(/root/reference/app/utils/pdf_utils.py:13-64 + the Gemini call X2). Real PDF
decoding would need a PDF library that is not in this container, so the
decode step is STUBBED: payloads carry a magic prefix (``%FAKEPDF``) followed
by a JSON body of positioned text runs, and this module performs the real
layout-aware reconstruction over those runs — sort by (page, line-y, x),
merge runs on the same baseline with single spaces, lines with newlines,
pages with a blank line — then applies the reference normalization chain
per page (/root/reference/app/utils/text_cleaning.py:6-37) and joins pages
with ``"\\n\\n"`` in page order
(/root/reference/app/services/full_ocr_service.py:203).

A genuine PDF byte stream (``%PDF`` prefix) goes through the minimal
pure-Python parser in ``pdf_parse.py`` (Flate + standard text operators);
documents beyond its scope (CID fonts, encryption, object streams) raise
``ValueError`` and become error-as-data rows upstream (X7).
"""

from __future__ import annotations

import json

from ocr_parallel_spark.config import PDF_MAGIC
from ocr_parallel_spark.kernel.normalize import clean_text

# Runs whose y differs by less than this share a baseline (same output line).
LINE_TOLERANCE = 2.0


def is_pdf_payload(payload: bytes) -> bool:
    return payload.startswith(PDF_MAGIC) or payload.startswith(b"%PDF")


def reconstruct_layout(runs: list[dict]) -> str:
    """Order text runs into reading order. ``runs``: dicts with keys
    ``page`` (int), ``x`` (float), ``y`` (float), ``text`` (str)."""
    by_page: dict[int, list[dict]] = {}
    for r in runs:
        by_page.setdefault(int(r["page"]), []).append(r)

    page_texts = []
    for page in sorted(by_page):
        runs_sorted = sorted(by_page[page], key=lambda r: (float(r["y"]), float(r["x"])))
        lines: list[list[dict]] = []
        for r in runs_sorted:
            if lines and abs(float(r["y"]) - float(lines[-1][0]["y"])) < LINE_TOLERANCE:
                lines[-1].append(r)
            else:
                lines.append([r])
        rendered = "\n".join(
            " ".join(str(r["text"]) for r in sorted(line, key=lambda r: float(r["x"])))
            for line in lines
        )
        page_texts.append(clean_text(rendered))
    return "\n\n".join(page_texts)


def extract_pdf(payload: bytes) -> dict:
    """Decode a layout payload and reconstruct its text.

    Returns the same shape as ``html_extract.extract_html``; page count is
    reported as ``n_blocks_total``/``n_blocks_kept`` (a page is the block
    unit on this path).
    """
    if payload.startswith(b"%PDF"):
        # Real PDF byte stream: minimal pure-Python parser (Flate + standard
        # text operators; see kernel/pdf_parse.py for scope). Unsupported
        # documents raise ValueError -> error-as-data row upstream (X7).
        from ocr_parallel_spark.kernel.pdf_parse import extract_pdf_runs

        runs = extract_pdf_runs(payload)
    else:
        body = payload[len(PDF_MAGIC):]
        doc = json.loads(body.decode("utf-8"))
        runs = doc["runs"]
    text = reconstruct_layout(runs)
    n_pages = len({int(r["page"]) for r in runs})
    return {
        "text": text,
        "spans": [],
        "n_blocks_total": n_pages,
        "n_blocks_kept": n_pages,
    }
