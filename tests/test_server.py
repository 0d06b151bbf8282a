"""End-to-end client <-> server tests: boots the REAL server as a
subprocess and drives the REST API with the client SDK — no mock server
(mirrors reference seekstorm_client/tests/test.rs:1-113)."""

import os
import re
import subprocess
import sys
import time

import numpy as np
import pytest

from seekstorm_tpu.client import RestClient, RestError


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("server_ix")
    env = dict(os.environ)
    # JAX_PLATFORMS (not just PLATFORM_NAME) so the axon TPU plugin is
    # never initialized in the subprocess — its tunnel init blocks behind
    # any concurrent TPU holder (see conftest.py)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["MASTER_KEY_SECRET"] = "test_master_secret"
    proc = subprocess.Popen(
        [sys.executable, "-m", "seekstorm_tpu.server",
         f"index_path={root}", "local_ip=127.0.0.1", "local_port=0",
         "--no-console"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    port = None
    master = None
    deadline = time.time() + 60
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            time.sleep(0.1)
            continue
        m = re.search(r"listening on http://127\.0\.0\.1:(\d+)", line)
        if m:
            port = int(m.group(1))
        m = re.search(r"master apikey: (\S+)", line)
        if m:
            master = m.group(1)
        if port and master:
            break
    assert port and master, "server did not start"
    yield {"port": port, "master": master, "proc": proc}
    proc.terminate()
    proc.wait(timeout=10)


@pytest.fixture(scope="module")
def client(server):
    c = RestClient(f"http://127.0.0.1:{server['port']}")
    # wait for live
    for _ in range(100):
        try:
            assert c.live()["status"] == "ok"
            break
        except Exception:
            time.sleep(0.2)
    key = c.create_apikey({"indices_max": 16}, master_key=server["master"])
    c.apikey = key
    return c


def test_live_and_auth(client, server):
    assert client.live() == {"status": "ok"}
    bad = RestClient(client.base, "aW52YWxpZA==")
    with pytest.raises(RestError) as e:
        bad.get_index_info(0)
    assert e.value.status == 401


def test_lexical_roundtrip(client):
    iid = client.create_index({
        "index_name": "demo",
        "schema": [
            {"field": "title", "field_type": "Text", "store": True,
             "index_lexical": True, "boost": 10.0},
            {"field": "body", "field_type": "Text", "store": True,
             "index_lexical": True},
            {"field": "year", "field_type": "U16", "store": True,
             "facet": True},
        ],
    })
    ids = client.index_documents(iid, [
        {"title": "quick brown fox", "body": "jumps over the dog", "year": 2001},
        {"title": "lazy dog", "body": "sleeps all day", "year": 2002},
        {"title": "brown bear", "body": "quick and strong", "year": 2001},
    ])
    assert ids == [0, 1, 2]
    client.commit_index(iid)

    info = client.get_index_info(iid)
    assert info["indexed_doc_count"] == 3

    r = client.query(iid, {"query": "quick brown",
                           "query_type_default": "Union",
                           "fields": ["title"]})
    assert r["count_total"] == 2
    assert {x["_id"] for x in r["results"]} == {0, 2}
    assert "title" in r["results"][0]

    # API default query type is Intersection (reference query_type_api)
    r = client.query(iid, {"query": "quick dog"})
    assert r["count_total"] == 1 and r["results"][0]["_id"] == 0

    r = client.query_get(iid, "dog")
    assert r["count_total"] == 2

    # facets over the API
    r = client.query(iid, {"query": "quick brown",
                           "query_type_default": "Union",
                           "query_facets": [{"field": "year"}]})
    assert dict((int(a), b) for a, b in r["facets"]["year"]) == {2001: 2}

    d = client.get_document(iid, 1)
    assert d["title"] == "lazy dog"

    new_id = client.update_document(iid, 1, {"title": "energetic dog",
                                             "body": "runs", "year": 2003})
    assert new_id == 3
    client.delete_document(iid, 0)
    client.commit_index(iid)
    r = client.query(iid, {"query": "dog", "query_type_default": "Union",
                           "realtime": True})
    assert {x["_id"] for x in r["results"]} == {3}

    it = client.get_iterator(iid, take=10, include_deleted=False)
    assert it == [2, 3]

    client.set_synonyms(iid, [{"terms": ["dog", "hound"], "multiway": True}])
    assert client.get_synonyms(iid) == [{"terms": ["dog", "hound"],
                                         "multiway": True}]


def test_vector_v2_binary(client):
    iid = client.create_index({
        "index_name": "vec",
        "schema": [{"field": "vector", "field_type": "Json",
                    "index_vector": True}],
        "inference": {"External": {"dimensions": 16, "precision": "F32",
                                   "quantization": "None",
                                   "similarity": "Euclidean"}},
        "clustering": "None",
    })
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((20, 16)).astype(np.float32)
    client.index_documents(iid, [{"vector": v.tolist()} for v in vecs])
    client.commit_index(iid)
    ids = client.query_binary(iid, vecs[7])
    assert ids[0] == 7

    # JSON vector query with reference-style tagged search_mode
    r = client.query(iid, {
        "query": "", "query_vector": vecs[3].tolist(),
        "search_mode": {"Vector": {"ann_mode": "All",
                                   "similarity_threshold": None}},
    })
    assert r["results"][0]["_id"] == 3


def test_empty_query_gate(client):
    iid = client.create_index({
        "index_name": "gate",
        "schema": [{"field": "t", "field_type": "Text", "store": True,
                    "index_lexical": True}],
    })
    client.index_documents(iid, [{"t": "alpha"}, {"t": "beta"}])
    client.commit_index(iid)
    r = client.query(iid, {"query": ""})
    assert r["count_total"] == 0 and r["results"] == []
    r = client.query(iid, {"query": "", "enable_empty_query": True})
    assert r["count_total"] == 2


def test_quota_and_apikey_lifecycle(client, server):
    c = RestClient(client.base)
    key = c.create_apikey({"indices_max": 1, "rate_limit": 1000},
                          master_key=server["master"])
    c.apikey = key
    c.create_index({"index_name": "one", "schema": []})
    with pytest.raises(RestError) as e:
        c.create_index({"index_name": "two", "schema": []})
    assert e.value.status == 403
    c.delete_apikey(key, master_key=server["master"])
    with pytest.raises(RestError) as e:
        c.get_apikey_indices()
    assert e.value.status == 401


def test_synonyms_applied_at_indexing(client):
    iid = client.create_index({
        "index_name": "syn",
        "schema": [{"field": "t", "field_type": "Text", "store": True,
                    "index_lexical": True}],
        "synonyms": [{"terms": ["car", "automobile"], "multiway": True}],
    })
    client.index_documents(iid, [{"t": "a red car"}, {"t": "an old bike"}])
    client.commit_index(iid)
    r = client.query(iid, {"query": "automobile"})
    assert r["count_total"] == 1 and r["results"][0]["_id"] == 0


def test_openapi(client):
    import urllib.request, json as _json

    with urllib.request.urlopen(client.base + "/openapi.json") as r:
        spec = _json.loads(r.read())
    assert spec["openapi"].startswith("3.")
    assert "/api/v1/index/{index_id}/query" in spec["paths"]


def test_web_ui_served(client):
    import urllib.request

    with urllib.request.urlopen(client.base + "/") as r:
        html = r.read().decode()
    assert "seekstorm-tpu" in html and "<script>" in html


def test_metrics_endpoint(client):
    """GET /metrics renders Prometheus counters moved by earlier tests."""
    import urllib.request

    with urllib.request.urlopen(client.base + "/metrics") as r:
        text = r.read().decode()
    assert "seekstorm_queries_total" in text
    assert "seekstorm_docs_indexed_total" in text
    assert "seekstorm_commits_total" in text


def test_pdf_file_upload(client):
    """POST /api/v1/index/{id}/file round-trips a real PDF (reference
    index_file_api; extractor is in-repo pdftext.py)."""
    from tests.test_pdf import make_pdf

    iid = client.create_index({
        "index_name": "pdfix",
        "schema": [
            {"field": "title", "field_type": "Text", "stored": True,
             "indexed": True},
            {"field": "body", "field_type": "Text", "stored": True,
             "indexed": True},
        ],
    })
    pdf = make_pdf(["searchable pdf xyzygy content"], title="PDF Title")
    did = client.index_pdf_bytes(iid, pdf)
    assert isinstance(did, int)
    client.commit_index(iid)
    rs = client.query(iid, {"query": "xyzygy", "length": 10,
                            "fields": ["title", "body"]})
    assert rs["count_total"] == 1
    assert rs["results"][0]["title"] == "PDF Title"


def test_facets_minmax_and_range_histogram(client):
    """Index info exposes numeric-facet min/max; a UI-style histogram
    ranges facet + range filter round-trips (reference master.js:14)."""
    iid = client.create_index({
        "index_name": "rangeix",
        "schema": [
            {"field": "body", "field_type": "Text", "stored": True,
             "indexed": True},
            {"field": "year", "field_type": "U16", "stored": True,
             "facet": True},
        ],
    })
    client.index_documents(iid, [
        {"body": f"doc {i}", "year": 1990 + (i % 30)} for i in range(90)
    ])
    client.commit_index(iid)
    info = client.get_index_info(iid)
    assert info["facets_minmax"]["year"] == [1990.0, 2019.0]
    lo, hi = info["facets_minmax"]["year"]
    w = (hi - lo) / 10
    r = client.query(iid, {
        "query": "doc", "length": 5,
        "query_facets": [{"field": "year", "length": 10, "ranges": {
            "field": "year", "range_type": "CountWithinRange",
            "ranges": [[str(i), lo + i * w] for i in range(10)]}}],
        "facet_filter": [{"field": "year", "range": [2000, 2009]}],
    })
    assert r["count_total"] == sum(1 for i in range(90)
                                   if 2000 <= 1990 + (i % 30) <= 2009)
    assert "year" in r["facets"]


def test_web_ui_has_range_slider_and_preview(client, server):
    import urllib.request

    html = urllib.request.urlopen(
        f"http://127.0.0.1:{server['port']}/").read().decode()
    assert "rangeFields" in html and "preview" in html and "modal" in html
