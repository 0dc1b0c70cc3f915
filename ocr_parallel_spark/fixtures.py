"""Deterministic extraction fixtures (FIXTURES.md §2).

Payload builders for every fixture class in FIXTURES.md — plain article,
boilerplate-heavy, link-farm, multi-section with ALL-CAPS titles, separator
collapsing, ``[ilegible]`` verbatim preservation, pdf-layout out-of-order
runs, malformed payloads. All byte-stable: fixed strings only, no RNG, no
wall clock (determinism rules, FIXTURES.md §5).

Golden expected texts live in ``tests/goldens/extraction_goldens.json`` and
are regenerated only by ``python scripts/regold.py`` (never implicitly).
"""

from __future__ import annotations

import json

from ocr_parallel_spark.config import PDF_MAGIC


def _page(body: str, title: str = "Fixture") -> bytes:
    return (
        "<!DOCTYPE html><html><head><title>"
        + title
        + "</title><style>body{margin:0}</style></head><body>"
        + body
        + "</body></html>"
    ).encode("utf-8")


_CHROME = (
    "<nav><ul><li><a href='/'>Home</a></li><li><a href='/a'>Archive</a></li>"
    "<li><a href='/c'>Contact</a></li></ul></nav>"
    "<header><h1>Site Title Banner</h1><p>tagline slogan words</p></header>"
)
_FOOTER = (
    "<footer><p>Copyright 2026 Example Site. All rights reserved. "
    "Privacy Terms Cookies</p></footer>"
    "<aside><p>Related links and promoted stories you may also like "
    "reading today</p></aside>"
)

_ARTICLE_1 = (
    "<article><h2>A Plain Article Heading</h2>"
    "<p>This is the first paragraph of the main content. It carries enough "
    "characters to clear the minimum block threshold comfortably.</p>"
    "<p>The second paragraph continues the argument with additional "
    "sentences so density scoring has something to measure.</p></article>"
)

_ARTICLE_2 = (
    "<main><h3>Observations on Batch Extraction</h3>"
    "<p>Deterministic kernels make distributed retries free because any "
    "task can be replayed without coordination.</p>"
    "<p>Columnar transport amortizes the interpreter boundary across "
    "thousands of rows per exchange.</p></main>"
)

_LINKFARM = (
    "<div><a href='/1'>cheap deals here</a> <a href='/2'>more cheap deals "
    "right now</a> <a href='/3'>click this link today</a> <a href='/4'>best "
    "offers of the year</a></div>"
)

_SECTIONS = (
    "<section><h2>PRIMERA SECCION</h2>"
    "<p>Contenido de la primera seccion con suficientes caracteres para "
    "superar el umbral establecido del kernel.</p></section>"
    "<section><h2>SEGUNDA SECCION</h2>"
    "<p>Contenido de la segunda seccion, igualmente largo para que el "
    "bloque sobreviva a la puntuacion de densidad.</p></section>"
)


def fixture_payloads() -> list[dict]:
    """All fixture cases: id, kind, payload bytes, expected_status."""
    cases: list[dict] = []

    def add(fid: str, kind: str, payload: bytes, status: str = "found"):
        cases.append(
            {
                "fixture_id": fid,
                "payload_kind": kind,
                "payload": payload,
                "expected_status": status,
            }
        )

    # 1. plain article HTML (single main block)
    add("html-plain-01", "html", _page(_ARTICLE_1))
    add("html-plain-02", "html", _page(_ARTICLE_2))

    # 2. boilerplate-heavy — nav/header/footer/aside must disappear
    add("html-boilerplate-01", "html", _page(_CHROME + _ARTICLE_1 + _FOOTER))
    add("html-boilerplate-02", "html", _page(_CHROME + _ARTICLE_2 + _FOOTER))

    # 3. link-farm block (high link density => dropped)
    add("html-linkfarm-01", "html", _page(_ARTICLE_1 + _LINKFARM))
    add(
        "html-linkfarm-02",
        "html",
        _page(_LINKFARM + _ARTICLE_2 + _LINKFARM),
    )

    # 4. multi-section ALL-CAPS titles
    add("html-sections-01", "html", _page(_SECTIONS))
    add("html-sections-02", "html", _page(_CHROME + _SECTIONS + _FOOTER))

    # 5. separator collapsing (messy whitespace inside blocks)
    add(
        "html-separators-01",
        "html",
        _page(
            "<p>Linea   con \t espacios     multiples y saltos\n\n\n"
            "internos que deben colapsar en uno solo correctamente.</p>"
        ),
    )
    add(
        "html-separators-02",
        "html",
        _page(
            "<p>Texto con literal \\n escapado \\n que se elimina y ademas  "
            "espacios repetidos en medio de la frase entera.</p>"
        ),
    )

    # 6. [ilegible]-style partial content preserved verbatim
    add(
        "html-ilegible-01",
        "html",
        _page(
            "<p>El lindero norte colinda con [ilegible] y el lindero sur "
            "con la carrera cuarenta y dos del municipio.</p>"
        ),
    )
    add(
        "html-ilegible-02",
        "html",
        _page(
            "<p>Folio de matricula [ilegible] registrado ante la notaria "
            "segunda del circulo en fecha [ilegible] del presente.</p>"
        ),
    )

    # 7. pdf-layout payloads with out-of-order runs
    runs1 = [
        {"page": 1, "y": 30.0, "x": 10.0, "text": "segunda linea izquierda"},
        {"page": 1, "y": 10.0, "x": 50.0, "text": "derecha"},
        {"page": 1, "y": 10.0, "x": 10.0, "text": "primera linea"},
        {"page": 1, "y": 30.5, "x": 90.0, "text": "derecha baja"},
    ]
    runs2 = [
        {"page": 2, "y": 10.0, "x": 10.0, "text": "pagina dos arriba"},
        {"page": 1, "y": 20.0, "x": 10.0, "text": "pagina uno unica"},
        {"page": 2, "y": 40.0, "x": 10.0, "text": "pagina dos abajo"},
    ]
    add(
        "pdf-layout-01",
        "pdf-layout",
        PDF_MAGIC + json.dumps({"runs": runs1}, sort_keys=True).encode(),
    )
    add(
        "pdf-layout-02",
        "pdf-layout",
        PDF_MAGIC + json.dumps({"runs": runs2}, sort_keys=True).encode(),
    )

    # 8. malformed payloads -> status='error'
    add("error-empty-01", "html", b"", status="error")
    add("error-badutf8-01", "html", b"\xff\xfe\x80garbage\x9f", status="error")
    add(
        "error-badjson-pdf-01",
        "pdf-layout",
        PDF_MAGIC + b"{not json at all",
        status="error",
    )
    add("error-realpdf-01", "pdf-layout", b"%PDF-1.7 stub body", status="error")

    return cases
