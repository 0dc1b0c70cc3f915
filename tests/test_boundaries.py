"""Boundary refinement (F5-F9 + W6 caps 5/15/20) — operator tests.

``_mirror_refine`` is an independent plain-Python implementation of the
documented algorithm (written from the spec in operators/boundaries.py,
NOT from the reference code); the Spark expression implementation must
agree with it on crafted branch-targeted cases AND on seeded random
inputs. This pins every branch: boundaries detected, start fallback scan,
section-end paragraph mark, hard 2000-char cap, densest-run reduction,
index-based expansion, numeric cap, and the three W6 caps.
"""

from __future__ import annotations

import random

import pytest

from ocr_parallel_spark.operators import boundaries as B

START_MARKERS = ["QQSTART ALPHA", "QQALT"]
AFTER_MARKERS = ["QQEND BETA", "QQEND GAMMA"]
BEFORE_MARKERS = ["QQNEXT ITEM"]


# ------------------------------------------------------------------ mirror --
def _match_page(tokens: list[str], text: str) -> bool:
    up = text.upper()
    padded = " " + "".join(ch if (ch.isalnum() or ch == "_") else " " for ch in up)
    padded = " ".join(padded.split())
    padded = f" {padded} "
    hits = 0
    for t in tokens:
        if t.isdigit():
            hits += int(f" {t} " in padded)
        else:
            hits += int(t in up)
    return len(tokens) > 0 and 5 * hits >= 3 * len(tokens)


def _detect_start(U: str, tokens: list[str], anchor: str) -> int | None:
    best_pos, best_hits = None, 0
    for i in range(0, len(U) - B.START_WINDOW, B.START_STRIDE):
        w = U[i : i + B.START_WINDOW]
        hits = sum(1 for t in tokens if t in w)
        if hits > best_hits and 2 * hits >= len(tokens) and hits > 0:
            for m in START_MARKERS:
                p = w.find(m)
                if p >= 0:
                    best_pos, best_hits = i + p, hits
                    break
    if best_pos is not None:
        return best_pos
    for i in range(0, len(U) - B.FALLBACK_WINDOW, B.START_STRIDE):
        w = U[i : i + B.FALLBACK_WINDOW]
        hits = sum(1 for t in tokens if t in w)
        if tokens and 10 * hits >= 7 * len(tokens) and anchor in w:
            return i
    return None


def _section_end(stext: str, pos: int) -> int:
    rel = stext.find(".\n\n", pos)
    if rel >= 0:
        return rel + 3
    return min(pos + B.SECTION_FALLBACK_CHARS, len(stext))


def _detect_end(U: str, start: int) -> int | None:
    stext = U[start : start + B.MAX_SEARCH_LENGTH]
    cands = []
    for m in AFTER_MARKERS:
        fm = stext.find(m)
        if fm >= 0:
            cands.append(_section_end(stext, fm + len(m)))
    for m in BEFORE_MARKERS:
        fm = stext.find(m)
        if fm >= 0:
            cands.append(fm)
    earliest = min(cands) if cands else None
    if earliest is not None and earliest < len(stext):
        return start + earliest
    if len(stext) > B.HARD_END_CAP:
        return start + B.HARD_END_CAP
    return None


def _densest(matching: list[int]) -> list[int]:
    if len(matching) <= B.DENSE_MIN_MATCHES:
        return matching
    bs = be = matching[0]
    bc = 1
    cs, cc = matching[0], 1
    for prev, p in zip(matching, matching[1:]):
        if p - prev > B.DENSE_GAP:
            if cc > bc:
                bs, be, bc = cs, prev, cc
            cs, cc = p, 1
        else:
            cc += 1
    if cc > bc:
        bs, be = cs, matching[-1]
    return [p for p in matching if bs <= p <= be]


def _concat(page_texts: dict[int, str], pages: list[int]) -> str:
    return "\n\n".join(page_texts[p] for p in pages)


def _mirror_refine(page_texts: dict[int, str], tokens: list[str], anchor: str):
    page_ids = sorted(page_texts)
    matching = [p for p in page_ids if _match_page(tokens, page_texts[p])]
    if not matching:
        final = page_ids[: B.MAX_FALLBACK_PAGES]
        return ("fallback_first5", final, None, None, _concat(page_texts, final))
    full = "\n\n".join(page_texts[p] for p in page_ids)
    U = full.upper()
    start = _detect_start(U, tokens, anchor)
    end = _detect_end(U, start) if start is not None else None
    start_page = end_page = None
    off = 0
    offsets = {}
    for p in page_ids:
        offsets[p] = off
        lo, hi = off, off + len(page_texts[p]) + 2
        if start is not None and start_page is None and lo <= start < hi:
            start_page = p
        if end is not None and end_page is None and lo <= end < hi:
            end_page = p
        off = hi
    if (
        start is not None
        and end is not None
        and start_page is not None
        and end_page is not None
    ):
        final = [p for p in page_ids if start_page <= p <= end_page]
        final = final[: B.MAX_PAGES_WITH_BOUNDARIES]
        rel = start - offsets[start_page]
        text = _concat(page_texts, final)[rel : rel + (end - start)]
        return ("boundaries", final, start, end, text)
    meff = _densest(matching)
    mn, mx = min(meff), max(meff)
    i_min, i_max = page_ids.index(mn), page_ids.index(mx)
    expanded = page_ids[
        max(0, i_min - B.EXPAND_BEFORE_IDX) : min(
            len(page_ids), i_max + B.EXPAND_AFTER_IDX + 1
        )
    ]
    if len(expanded) > B.MAX_PAGES_WITHOUT_BOUNDARIES:
        limited = [
            p
            for p in page_ids
            if mn - B.NUMERIC_BEFORE <= p <= mx + B.NUMERIC_AFTER
        ]
        limited = limited[: B.MAX_PAGES_WITHOUT_BOUNDARIES]
        return ("expanded", limited, start, end, _concat(page_texts, limited))
    return ("expanded", expanded, start, end, _concat(page_texts, expanded))


# ------------------------------------------------------------------ driver --
def _run_spark(spark, cases):
    """cases: list of (case_id, page_texts, tokens, anchor). Runs every
    case in ONE refine call (source = case id)."""
    cand_rows, page_rows, target_rows = [], [], []
    for cid, (page_texts, tokens, anchor) in enumerate(cases):
        for p, txt in page_texts.items():
            doc_id = cid * 1000 + p
            cand_rows.append((cid, f"case{cid}", doc_id))
            page_rows.append((doc_id, txt))
        target_rows.append((cid, tokens, anchor))
    cand = spark.createDataFrame(
        cand_rows, "target_id int, source string, doc_id bigint"
    )
    pages = spark.createDataFrame(page_rows, "doc_id bigint, norm string")
    targets = spark.createDataFrame(
        target_rows, "target_id int, tokens array<string>, anchor string"
    )
    out = B.refine_pages_with_boundaries(
        cand, pages, targets, START_MARKERS, AFTER_MARKERS, BEFORE_MARKERS
    )
    return {r.target_id: r for r in out.collect()}


def _check(spark, cases):
    got = _run_spark(spark, cases)
    for cid, (page_texts, tokens, anchor) in enumerate(cases):
        method, pages_, start, end, text = _mirror_refine(
            page_texts, tokens, anchor
        )
        exp_csv = ",".join(str(cid * 1000 + p) for p in pages_)
        r = got[cid]
        assert r.method == method, (cid, r.method, method)
        assert r.pages_csv == exp_csv, (cid, r.pages_csv, exp_csv)
        assert r.n_pages == len(pages_), cid
        assert r.start_char == start, (cid, r.start_char, start)
        assert r.end_char == end, (cid, r.end_char, end)
        assert r.refined_text == text, (cid, r.refined_text[:80], text[:80])


FILLER = "lorem word text page content filler body line item value "


def _page(*parts: str, pad: int = 120) -> str:
    body = " ".join(parts)
    while len(body) < pad:
        body += " " + FILLER.strip()
    return body


def test_branch_targeted_cases(spark):
    cases = [
        # 0: clean boundaries — start marker + tokens in one window,
        # after-marker a bit later (section fallback +500).
        (
            {
                0: _page("intro only"),
                1: _page("ALPHA BRAVO qqstart alpha ALPHA BRAVO details"),
                2: _page("more ALPHA BRAVO body qqend beta trailing"),
                3: _page("tail page"),
            },
            ["ALPHA", "BRAVO"],
            "ALPHA",
        ),
        # 1: no page matches -> fallback_first5 of 7 candidates.
        (
            {p: _page(f"nothing here {p}") for p in range(7)},
            ["ZULU", "YANKEE"],
            "ZULU",
        ),
        # 2: page matches but no start marker -> expanded path.
        (
            {
                0: _page("CHARLIE DELTA appears here"),
                1: _page("plain"),
                2: _page("CHARLIE DELTA again"),
                3: _page("plain"),
            },
            ["CHARLIE", "DELTA"],
            "CHARLIE",
        ),
        # 3: start via the FALLBACK anchor scan (>=70% coverage + anchor,
        # no start marker anywhere) then no end candidates within reach
        # and short text -> end None -> expanded with start set.
        (
            {
                0: _page("ECHO FOXTROT 77 all together in one window"),
                1: _page("filler"),
            },
            ["ECHO", "FOXTROT", "77"],
            "77",
        ),
        # 4: before-marker ends the span early.
        (
            {
                0: _page("GOLF HOTEL qqstart alpha GOLF HOTEL"),
                1: _page("body qqnext item another entity"),
            },
            ["GOLF", "HOTEL"],
            "GOLF",
        ),
    ]
    _check(spark, cases)


def test_hard_cap_2000_and_page_caps(spark):
    # start marker fires, NO end marker anywhere, >2000 chars remain
    # -> end = start + 2000; with-boundaries span wider than 15 pages
    # -> capped at 15 (W6).
    pages = {0: _page("INDIA JULIET qqstart alpha INDIA JULIET", pad=150)}
    for p in range(1, 24):
        pages[p] = _page(f"INDIA JULIET continues {p}", pad=150)
    cases = [(pages, ["INDIA", "JULIET"], "INDIA")]
    got = _run_spark(spark, cases)
    method, pages_, start, end, _text = _mirror_refine(*cases[0])
    r = got[0]
    assert method == "boundaries" and end == start + B.HARD_END_CAP
    assert len(pages_) <= B.MAX_PAGES_WITH_BOUNDARIES
    assert r.method == method and r.start_char == start and r.end_char == end
    assert r.n_pages == len(pages_)


def test_empty_end_marker_lists(spark):
    # No end markers configured at all: the plan must still build (the
    # empty-cands guard mirrors _first_marker_pos) and only the 2000-char
    # hard cap can set end_char.
    pages = {0: _page("OSCAR PAPA qqstart alpha OSCAR PAPA", pad=150)}
    for p in range(1, 24):
        pages[p] = _page(f"OSCAR PAPA continues {p}", pad=150)
    cand = spark.createDataFrame(
        [(0, "case0", p) for p in pages], "target_id int, source string, doc_id bigint"
    )
    pdf = spark.createDataFrame(
        list(pages.items()), "doc_id bigint, norm string"
    )
    targets = spark.createDataFrame(
        [(0, ["OSCAR", "PAPA"], "OSCAR")],
        "target_id int, tokens array<string>, anchor string",
    )
    out = B.refine_pages_with_boundaries(
        cand, pdf, targets, START_MARKERS, [], []
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.method == "boundaries"
    assert r.end_char == r.start_char + B.HARD_END_CAP

    # short text + no markers -> no end boundary at all (expanded path)
    short = spark.createDataFrame(
        [(1, "case1", 0)], "target_id int, source string, doc_id bigint"
    )
    spdf = spark.createDataFrame(
        [(0, _page("QUEBEC ROMEO qqstart alpha QUEBEC ROMEO"))],
        "doc_id bigint, norm string",
    )
    st = spark.createDataFrame(
        [(1, ["QUEBEC", "ROMEO"], "QUEBEC")],
        "target_id int, tokens array<string>, anchor string",
    )
    out2 = B.refine_pages_with_boundaries(
        short, spdf, st, START_MARKERS, [], []
    ).collect()
    assert len(out2) == 1 and out2[0].end_char is None


def test_densest_run_and_numeric_cap(spark):
    # >10 matched pages in two clusters (gap > 3) -> densest run wins;
    # expansion overflows 20 -> numeric window [mn-2, mx+12] capped at 20.
    # The anchor never appears in any page, so the fallback start scan
    # cannot fire and the no-boundaries (expanded) path is forced.
    pages = {}
    for p in range(0, 40):
        if (5 <= p <= 9) or (20 <= p <= 27):  # clusters of 5 and 8
            pages[p] = _page(f"KILO LIMA match {p}")
        else:
            pages[p] = _page(f"plain {p}")
    cases = [(pages, ["KILO", "LIMA"], "ZZANCHOR")]
    got = _run_spark(spark, cases)
    method, pages_, start, end, _text = _mirror_refine(*cases[0])
    assert method == "expanded" and len(pages_) <= B.MAX_PAGES_WITHOUT_BOUNDARIES
    r = got[0]
    assert r.method == method
    assert r.pages_csv == ",".join(str(0 * 1000 + p) for p in pages_)


def test_section_end_paragraph_branch(spark):
    # after-marker followed by ".\n\n" within the page -> match end + 3.
    # The "." and page separator land adjacent by making the marker page
    # end with "." so the separator forms ".\n\n".
    pages = {
        0: _page("MIKE NOVEMBER qqstart alpha MIKE NOVEMBER"),
        1: _page("middle qqend beta closing words") + " end.",
        2: _page("next page"),
    }
    cases = [(pages, ["MIKE", "NOVEMBER"], "MIKE")]
    _check(spark, cases)


def test_multibyte_chars_keep_char_offsets(spark):
    """Boundary positions are CHAR offsets, not byte offsets: multi-byte
    text before the markers must not shift start/end. The mirror works in
    Python chars; Spark substring/locate/length are char-based on UTF-8 —
    this pins that no byte-based shortcut sneaks in."""
    cases = [
        (
            {
                0: _page("café résumé naïve Ünïcödé déjà vu " * 4),
                1: _page("PÄPA QÜEBEC qqstart alpha PÄPA QÜEBEC détails"),
                2: _page("more body qqend beta closing déjà"),
            },
            ["PÄPA", "QÜEBEC"],
            "PÄPA",
        ),
    ]
    _check(spark, cases)
    # sanity: the text really is multi-byte (chars != bytes)
    t = cases[0][0][0]
    assert len(t.encode("utf-8")) > len(t)


@pytest.mark.parametrize("seed", [7, 42])
def test_randomized_agreement(spark, seed):
    rng = random.Random(seed)
    vocab = ["papa", "quebec", "romeo", "sierra", "tango", "uniform", "victor"]
    cases = []
    for _ in range(12):
        n_pages = rng.randint(1, 18)
        toks = rng.sample(["PAPA", "QUEBEC", "ROMEO", "SIERRA", "99"], k=3)
        # page ids with gaps: candidate sets at real scale are unions of
        # chunk ranges minus other-source ids, never contiguous
        ids = sorted(rng.sample(range(60), k=n_pages))
        pages = {}
        for p in ids:
            words = rng.choices(vocab, k=rng.randint(10, 60))
            if rng.random() < 0.5:  # seed token hits
                words += [t.lower() for t in rng.sample(toks, k=rng.randint(1, 3))]
            if rng.random() < 0.25:
                words.append("qqstart alpha")
            if rng.random() < 0.2:
                words.append("qqend beta")
            if rng.random() < 0.15:
                words.append("qqnext item")
            if rng.random() < 0.2:
                words.append("end.")
            pages[p] = " ".join(words)
        cases.append((pages, toks, toks[0]))
    _check(spark, cases)


def test_large_document_scan_is_not_quadratic(spark):
    """Scale guard: a single 800-page (~120 KB text) group must refine in
    seconds. Before the segmented window extraction this was minutes —
    UTF8String resolves char offsets by walking from position 0, so
    direct substring windows cost O(windows x position). The mirror
    (linear Python) cross-checks the answer at the same size."""
    import time

    pages = {
        p: _page(f"unique words here {p} {'filler body text ' * 5}", pad=150)
        for p in range(800)
    }
    pages[400] = _page("XRAY YANKEE qqstart alpha XRAY YANKEE details")
    pages[402] = _page("more body qqend beta closing")
    cases = [(pages, ["XRAY", "YANKEE"], "XRAY")]
    t0 = time.time()
    got = _run_spark(spark, cases)
    wall = time.time() - t0
    method, pages_, start, end, _text = _mirror_refine(*cases[0])
    r = got[0]
    assert (r.method, r.start_char, r.end_char) == (method, start, end)
    assert r.pages_csv == ",".join(str(p) for p in pages_)
    # generous bound: ~3 s typical with segments, minutes without
    assert wall < 60, f"boundary scan took {wall:.0f}s — quadratic regression?"


def test_refine_plan_shape(spark):
    """Plan guard: one broadcast join for targets, no row-at-a-time
    Python, no SortMergeJoin on the candidates path, and the window
    scans are expression work above a single aggregate."""
    cand = spark.createDataFrame(
        [(1, "s", 0), (1, "s", 1)], "target_id int, source string, doc_id bigint"
    )
    pages = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text")], "doc_id bigint, norm string"
    )
    targets = spark.createDataFrame(
        [(1, ["ALPHA"], "ALPHA")], "target_id int, tokens array<string>, anchor string"
    )
    out = B.refine_pages_with_boundaries(
        cand, pages, targets, START_MARKERS, AFTER_MARKERS, BEFORE_MARKERS
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p  # zero Python on this operator
