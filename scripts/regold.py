"""Regenerate golden expected texts for the extraction fixtures.

Explicit-only step (FIXTURES.md §5): run ``python scripts/regold.py`` and
commit the diff. Tests then assert the kernel output equals these goldens
byte-for-byte — the per-row invariant of BASELINE.json.
"""

from __future__ import annotations

import base64
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ocr_parallel_spark.fixtures import fixture_payloads
from ocr_parallel_spark.kernel.extract import extract_payload

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    goldens = []
    for case in fixture_payloads():
        rec = extract_payload(case["payload"])
        goldens.append(
            {
                "fixture_id": case["fixture_id"],
                "payload_kind": case["payload_kind"],
                "payload_b64": base64.b64encode(case["payload"]).decode(),
                "expected_status": rec["status"],
                "expected_error_type": rec["error_type"],
                "expected_text": rec["text"],
                "expected_spans": [list(s) for s in rec["spans"]],
                "n_blocks_kept": rec["n_blocks_kept"],
                "simhash": rec["simhash"],
            }
        )
        declared = case["expected_status"]
        if rec["status"] != declared:
            raise SystemExit(
                f"{case['fixture_id']}: kernel status {rec['status']} != declared {declared}"
            )
    path = OUT / "extraction_goldens.json"
    path.write_text(json.dumps(goldens, indent=1, ensure_ascii=False, sort_keys=True))
    print(f"wrote {len(goldens)} goldens -> {path}")


if __name__ == "__main__":
    main()
