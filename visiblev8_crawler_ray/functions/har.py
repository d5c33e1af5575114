"""Deterministic synthetic HAR payloads + mime classing shared by the
engine and its DuckDB twin.

The reference's browser capture writes one HAR per visited page
(``crawler.js`` devtools capture -> ``vv8_worker/tasks.py:184-279``
GridFS artifact); the sandbox's synthetic web stands in a deterministic
per-document request log so the HAR-content analytics
(:func:`..pipelines.multimodal.har_entries`) parse REAL JSON bytes from
disk without a network.  Every field derives from md5 of
``doc_id | entry-index`` — stable across runs, parallelism levels and
engines (the SQL twin re-parses the same bytes via ``read_blob``).
"""

from __future__ import annotations

import hashlib
import json

#: subresource mime population (one per mime class + JSON as 'other')
HAR_MIMES = ("text/html", "text/css", "application/javascript",
             "image/png", "application/json")


def synth_har(doc_id: str) -> bytes:
    """Deterministic HAR JSON for one page visit: 3-8 requests whose
    host / mime / size / status all derive from the doc id."""
    h = int.from_bytes(hashlib.md5(doc_id.encode()).digest()[:4], "big")
    n = 3 + h % 6
    entries = []
    for i in range(n):
        hi = int.from_bytes(
            hashlib.md5(f"{doc_id}|{i}".encode()).digest()[:8], "big")
        host = "origin.example" if i == 0 else f"cdn{hi % 7}.example"
        entries.append({
            "request": {"url": f"https://{host}/r/{i}", "method": "GET"},
            "response": {
                "status": 200 if hi % 11 else 404,
                "content": {"mimeType": HAR_MIMES[hi % len(HAR_MIMES)],
                            "size": 200 + hi % 4000},
            },
        })
    return json.dumps({"log": {"doc": doc_id, "entries": entries}},
                      separators=(",", ":")).encode()
