"""Automated HTTP round-trip tests (the reference only has a manual ruby
script, server/code/http/test.rb — SURVEY.md §4 flags the missing automated
coverage; this closes that gap)."""

import json
import threading
import urllib.request

import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.server.http import HttpServer
from blama_tpu.server.server import Server
from blama_tpu.testing import write_tiny_llama

CHATML = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n' + "
    "message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("srv") / "tiny.gguf")
    write_tiny_llama(p, GGMLType.Q8_0, chat_template=CHATML)
    model = Model(p)
    api = Server(model, InstanceInitParams(ctx_size=128))
    srv = HttpServer(("127.0.0.1", 0), api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    api.close()
    model.close()


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_complete_roundtrip_and_verify(http_server):
    request = {"prompt": "hello world", "max_tokens": 6, "seed": 42, "temp": 0.0}
    status, out = post(http_server + "/complete", request)
    assert status == 200
    assert "text" in out and "tokenData" in out
    assert 1 <= len(out["tokenData"]) <= 6
    td = out["tokenData"][0]
    assert set(td) == {"str", "id", "logits"}
    assert len(td["logits"]) == 10
    assert set(td["logits"][0]) == {"id", "logit"}

    # feed the completion back for verification (same flow as test.rb:10-25)
    status, vr = post(
        http_server + "/verify_completion",
        {"request": request, "response": {"tokenData": out["tokenData"]}},
    )
    assert status == 200
    assert vr["result"] == pytest.approx(1.0, abs=1e-6)


def test_verify_detects_tampering(http_server):
    request = {"prompt": "the cat sat", "max_tokens": 5, "seed": 1, "temp": 0.0}
    _, out = post(http_server + "/complete", request)
    tampered = [dict(td) for td in out["tokenData"]]
    for td in tampered:
        td["logits"] = [
            {"id": l["id"], "logit": l["logit"] * 3.0 + 5.0} for l in td["logits"]
        ]
    _, vr = post(
        http_server + "/verify_completion",
        {"request": request, "response": {"tokenData": tampered}},
    )
    assert vr["result"] < 0.95


def test_chat_completions_and_chat_verify(http_server):
    request = {
        "messages": [
            {"role": "system", "content": "you are helpful"},
            {"role": "user", "content": "hello"},
        ],
        "max_tokens": 4,
        "seed": 7,
        "temp": 0.0,
    }
    status, out = post(http_server + "/chat/completions", request)
    assert status == 200
    assert len(out["tokenData"]) >= 1

    status, vr = post(
        http_server + "/chat/verify_completion",
        {"request": request, "response": {"tokenData": out["tokenData"]}},
    )
    assert status == 200
    assert vr["result"] == pytest.approx(1.0, abs=1e-6)


def test_unknown_route_404(http_server):
    req = urllib.request.Request(
        http_server + "/nope", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404


def test_get_is_bad_request(http_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(http_server + "/complete", timeout=30)
    assert e.value.code == 400


def test_bad_json_400(http_server):
    req = urllib.request.Request(
        http_server + "/complete", data=b"not json", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_metrics_endpoint(http_server):
    # generate something first so counters move
    post(http_server + "/complete", {"prompt": "hello", "max_tokens": 3, "temp": 0.0})
    with urllib.request.urlopen(http_server + "/metrics", timeout=30) as r:
        snap = json.loads(r.read())
    assert snap["tokens_decoded"] >= 1
    assert snap["tokens_prefilled"] >= 1
    assert "timers" in snap


def test_scheduler_backed_server(tmp_path):
    """Opt-in continuous-batching server: same wire behavior on /complete and
    verification passes against the solo replay path."""
    import blama_tpu.server.scheduler_server as ss
    from blama_tpu.server.http import HttpServer as HS

    p = str(tmp_path / "s.gguf")
    write_tiny_llama(p, GGMLType.Q8_0, chat_template=CHATML)
    model = Model(p)
    api = ss.SchedulerServer(model, InstanceInitParams(ctx_size=128), max_batch=2)
    srv = HS(("127.0.0.1", 0), api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        request = {"prompt": "hello world", "max_tokens": 5, "seed": 42, "temp": 0.0}
        status, out = post(base + "/complete", request)
        assert status == 200
        assert len(out["tokenData"]) >= 1
        assert len(out["tokenData"][0]["logits"]) == 10
        # verification replays on the solo deterministic path and passes
        status, vr = post(
            base + "/verify_completion",
            {"request": request, "response": {"tokenData": out["tokenData"]}},
        )
        assert status == 200
        assert vr["result"] == pytest.approx(1.0, abs=1e-6)
        snap = json.loads(urllib.request.urlopen(base + "/metrics", timeout=30).read())
        assert "scheduler" in snap
    finally:
        srv.shutdown()
        api.close()
        model.close()


def post_raw(url, payload, extra_headers=None):
    req = urllib.request.Request(
        url, data=payload, method="POST",
        headers={"Content-Type": "application/json", **(extra_headers or {})},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_oversized_payload_rejected(http_server):
    import urllib.error
    body = json.dumps({"prompt": "x" * 1000}).encode()
    req = urllib.request.Request(
        http_server + "/complete", data=body, method="POST",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(64 << 20)})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    except Exception:
        status = 413  # connection reset after 413 also acceptable
    assert status == 413


def test_concurrency_limit_responds_503(tmp_path):
    import urllib.error
    p = str(tmp_path / "tiny2.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    model = Model(p)
    api = Server(model, InstanceInitParams(ctx_size=64))
    srv = HttpServer(("127.0.0.1", 0), api, max_concurrent=1)
    # exhaust the single slot so the next request is rejected immediately
    srv.slots.acquire()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/complete", data=b"{}", method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                status, body = r.status, r.read()
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read()
        assert status == 503
        assert b"too many concurrent" in body
    finally:
        srv.shutdown()
        api.close()
        model.close()


def test_request_timeout_responds_503(tmp_path):
    import urllib.error
    p = str(tmp_path / "tiny3.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    model = Model(p)
    api = Server(model, InstanceInitParams(ctx_size=64))
    srv = HttpServer(("127.0.0.1", 0), api, request_timeout=1e-4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/complete",
            data=json.dumps({"prompt": "hello", "max_tokens": 4}).encode(),
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                status, body = r.status, r.read()
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read()
        assert status == 503
        assert b"timed out" in body
    finally:
        srv.shutdown()
        api.close()
        model.close()
