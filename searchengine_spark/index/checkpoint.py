"""Per-segment checkpoint manifests: resume + lineage (SURVEY.md §4 item 5).

The reference's crude analog is the site status machine
(SiteTable.status INDEXING/INDEXED/FAILED, model/Status.java:3-7, updated at
IndexingServiceImpl.java:134-141/:285-286); here each doc-range segment gets
a JSON manifest carrying counts and an order-independent input fingerprint,
and a resumed build skips segments whose manifest is 'done'.  Idempotence:
re-running a done segment would overwrite with byte-identical parquet
(deterministic doc_ids + deterministic encode), proven in tests/test_resume.py.
"""

from __future__ import annotations

import json
import os


def _manifest_path(out_dir: str, segment: int) -> str:
    return f"{out_dir}/manifests/segment={segment}.json"


def write_manifest(out_dir: str, segment: int, stats: dict) -> None:
    os.makedirs(f"{out_dir}/manifests", exist_ok=True)
    tmp = _manifest_path(out_dir, segment) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(stats, fh, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir, segment))  # atomic publish


def read_manifest(out_dir: str, segment: int) -> dict | None:
    p = _manifest_path(out_dir, segment)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def segment_done(out_dir: str, segment: int) -> bool:
    m = read_manifest(out_dir, segment)
    return bool(m and m.get("status") == "done")


def all_manifests(out_dir: str) -> list[dict]:
    d = f"{out_dir}/manifests"
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(f"{d}/{name}") as fh:
                out.append(json.load(fh))
    return out
