"""HTTP serving tier end-to-end: search / catalog / status / jobs /
delete over a real (small) warehouse, via actual HTTP requests.
Mirrors the reference's API surface (api/app.py:198-333)."""

from __future__ import annotations

import json
import os
import time
import urllib.request

import pytest

from docling_rag_spark.api.server import serve_background
from docling_rag_spark.sources.pages import write_pages_parquet


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def _req(base, path, method, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    pages = str(root / "pages.parquet")
    wh = str(root / "wh")
    write_pages_parquet(pages, 50)
    srv, base = serve_background(spark, wh)
    yield base, pages, wh
    srv.shutdown()


def test_full_api_lifecycle(api):
    base, pages, wh = api
    assert _get(base, "/health") == (200, {"status": "ok"})

    # extract via POST -> async job -> poll to done
    code, out = _req(base, "/extract", "POST",
                     {"pages_path": pages, "num_buckets": 8})
    assert code == 202
    job_id = out["job_id"]
    for _ in range(600):
        code, job = _get(base, f"/jobs/{job_id}")
        if job["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert job["status"] == "done" and job["doc_count"] == 50

    # status rollup reflects the lineage table
    code, st = _get(base, "/status")
    assert code == 200
    snap = st["snapshots"][0]
    assert snap["doc_count"] == 50 and snap["buckets_done"] == 8

    # catalog listing
    code, docs = _get(base, "/documents?limit=1000")
    assert code == 200 and len(docs["documents"]) == 50
    assert {"url", "title", "status", "n_chunks"} <= set(
        docs["documents"][0])

    # search (on-the-fly embed; results decorated with title + preview)
    code, res = _get(base, "/search?q=star+schema+fact+table&k=3")
    assert code == 200
    assert 1 <= len(res["results"]) <= 3
    top = res["results"][0]
    assert {"url", "chunk_id", "score", "title", "heading_path",
            "preview"} <= set(top)
    assert top["score"] > 0

    # chat: deterministic cited context + sources panel (mirrors the
    # reference tests/api/test_chat_endpoint.py minus the model call —
    # test_chat_returns_answer_and_sources + test_chat_logs_agent_search)
    searches_dir = os.path.join(wh, "searches")
    n_logs_before = len(os.listdir(searches_dir)) \
        if os.path.isdir(searches_dir) else 0
    code, chat = _req(base, "/chat", "POST",
                      {"message": "star schema fact table", "top_k": 3})
    assert code == 200
    assert isinstance(chat["answer"], str) and chat["answer"]
    assert chat["answer"].startswith("[1] ")
    assert "score=" in chat["answer"]
    assert chat["sources"], "search tool found hits -> sources non-empty"
    src = chat["sources"][0]
    assert "/" not in src["file"]            # basename, not the full url
    assert src["file"] in chat["answer"]     # the citation names the file
    assert isinstance(src["headings"], list)
    assert isinstance(src["score"], float)
    assert isinstance(src["text"], str) and src["text"]
    assert src["text"] in chat["answer"]     # answer embeds the chunk text
    assert "element_type" in src and "page" in src
    # the agent's search-tool call is logged (one entry per /chat)
    assert len(os.listdir(searches_dir)) == n_logs_before + 1
    # contract errors
    assert _req(base, "/chat", "POST", {})[0] == 400

    # resubmitting the same snapshot: resume semantics, zero new work
    code, out = _req(base, "/extract", "POST",
                     {"pages_path": pages, "num_buckets": 8})
    job2 = out["job_id"]
    for _ in range(600):
        code, j2 = _get(base, f"/jobs/{job2}")
        if j2["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert j2["status"] == "done" and j2["buckets_skipped"] == 8
    assert j2["doc_count"] == 0

    # delete one url: FK cascade across tables, catalog shrinks
    victim = docs["documents"][0]["url"]
    from urllib.parse import quote
    code, deleted = _req(base, f"/documents?url={quote(victim, safe='')}",
                         "DELETE")
    assert code == 200 and sum(deleted["rows_deleted"].values()) > 0
    code, docs2 = _get(base, "/documents?limit=1000")
    assert len(docs2["documents"]) == 49
    assert all(d["url"] != victim for d in docs2["documents"])

    # error surfaces
    assert _req(base, "/jobs/nope", "GET")[0] == 404
    assert _req(base, "/search", "GET")[0] == 400


def test_search_missing_store_404(spark, tmp_path):
    srv, base = serve_background(spark, str(tmp_path / "empty-wh"))
    try:
        code, out = _req(base, "/search?q=x", "GET")
        assert code in (404, 500) and "error" in out
    finally:
        srv.shutdown()
