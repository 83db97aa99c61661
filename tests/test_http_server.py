"""HTTP serving front-end (eval/http_server.py + serve_vqa.py contract).

Real sockets, real threads: the server is started on an ephemeral port and
exercised with urllib — JSON protocol, b64 image upload, batch endpoint,
error taxonomy (400/404), and concurrent clients against the single
compute lock.
"""

import base64
import concurrent.futures
import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from t5_resnet_vqa_tpu.data import make_synthetic_daquar
from t5_resnet_vqa_tpu.eval import VQAInferenceSession
from t5_resnet_vqa_tpu.eval.http_server import VQAHTTPServer
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.train.factory import CNN_FAMILY


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_http"))
    root, kw = make_synthetic_daquar(root, num_train=4, num_test=4,
                                     image_size=64)
    answers = [a.strip("\n") for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    hidden = 32
    model = ResnetVQAModel(
        answer_spaces=len(answers), vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8,
                           d_ff=64, num_layers=1, num_decoder_layers=1,
                           num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=np.zeros((2, 16), np.int32),
        question_attention_masks=np.ones((2, 16), np.int32),
        image_tensors=rng.random((2, 64, 64, 3)).astype(np.float32),
    )["params"]
    session = VQAInferenceSession(model, params, answers, CNN_FAMILY,
                                  batch_size=4, image_size=64)
    server = VQAHTTPServer(session, port=0).start()   # ephemeral port
    images_dir = os.path.join(root, kw["images_dir"])
    image_paths = [os.path.join(images_dir, f)
                   for f in sorted(os.listdir(images_dir))]
    yield server, answers, image_paths
    server.close()


def _call(server, method, path, body=None):
    url = f"http://{server.host}:{server.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    server, answers, _ = served
    status, body = _call(server, "GET", "/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["family"] == CNN_FAMILY
    assert body["batch_size"] == 4
    assert body["answer_space_size"] == len(answers)


def test_ask_by_path_and_by_b64_agree(served):
    server, answers, images = served
    q = "what is on the table?"
    s1, by_path = _call(server, "POST", "/v1/ask",
                        {"image_path": images[0], "question": q, "top_k": 3})
    b64 = base64.b64encode(open(images[0], "rb").read()).decode()
    s2, by_b64 = _call(server, "POST", "/v1/ask",
                       {"image_b64": b64, "question": q, "top_k": 3})
    assert s1 == s2 == 200
    assert by_path["answer"] in answers
    assert by_path["top_answers"] == by_b64["top_answers"]
    # b64 temp files are cleaned up
    import glob
    import tempfile
    assert not glob.glob(os.path.join(tempfile.gettempdir(), "vqa_req_*"))


def test_ask_batch(served):
    server, answers, images = served
    reqs = [{"image_path": images[i % len(images)],
             "question": f"question {i}?"} for i in range(6)]
    status, body = _call(server, "POST", "/v1/ask_batch",
                         {"requests": reqs, "top_k": 2})
    assert status == 200
    assert len(body["results"]) == 6
    assert all(r["answer"] in answers for r in body["results"])


def test_error_taxonomy(served):
    server, _, images = served
    cases = [
        ("POST", "/v1/ask", {"question": "no image"}, 400, "image"),
        ("POST", "/v1/ask", {"image_path": images[0]}, 400, "question"),
        ("POST", "/v1/ask", {"image_path": "/nope.png", "question": "?"},
         400, "not found"),
        ("POST", "/v1/ask", {"image_b64": "!!!", "question": "?"},
         400, "base64"),
        ("POST", "/v1/ask_batch", {"requests": []}, 400, "non-empty"),
        ("POST", "/v1/nope", {}, 404, "unknown route"),
        ("GET", "/v1/ask", None, 404, "unknown route"),
        # CNN family has no decoder -> generate refuses over the wire
        ("POST", "/v1/generate",
         {"image_path": images[0], "question": "?"}, 400, "ViT enc-dec"),
    ]
    for method, path, body, want_status, want_msg in cases:
        status, payload = _call(server, method, path, body)
        assert status == want_status, (path, payload)
        assert want_msg in payload["error"]


def test_non_json_body_is_400(served):
    server, _, _ = served
    url = f"http://{server.host}:{server.port}/v1/ask"
    req = urllib.request.Request(url, data=b"not json{", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_concurrent_clients(served):
    """ThreadingHTTPServer + the compute lock: parallel requests all
    succeed and agree with the serial answer."""
    server, _, images = served
    q = "what is here?"
    _, serial = _call(server, "POST", "/v1/ask",
                      {"image_path": images[1], "question": q})
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(_call, server, "POST", "/v1/ask",
                            {"image_path": images[1], "question": q})
                for _ in range(8)]
        results = [f.result() for f in futs]
    assert all(status == 200 for status, _ in results)
    assert all(body["answer"] == serial["answer"] for _, body in results)
    _, health = _call(server, "GET", "/healthz")
    assert health["requests_served"] >= 9


def test_image_root_allowlist(served):
    """--image-root policy (advisor r3): paths outside the root are rejected
    with a constant message that never echoes the probed path; paths inside
    keep working; non-loopback binds without a root refuse image_path but
    keep image_b64."""
    server, _, images = served
    images_dir = os.path.dirname(images[0])
    try:
        server.image_root = os.path.realpath(images_dir)

        status, body = _call(server, "POST", "/v1/ask",
                             {"image_path": images[0], "question": "?"})
        assert status == 200 and "answer" in body

        probe = "/etc/passwd"
        status, body = _call(server, "POST", "/v1/ask",
                             {"image_path": probe, "question": "?"})
        assert status == 400
        assert probe not in body["error"]            # no filesystem oracle
        # traversal out of the root is caught after realpath resolution
        sneaky = os.path.join(images_dir, "..", "..", "etc", "passwd")
        status, body = _call(server, "POST", "/v1/ask",
                             {"image_path": sneaky, "question": "?"})
        assert status == 400 and "passwd" not in body["error"]
        # existence inside the root is also not echoed
        status, body = _call(server, "POST", "/v1/ask",
                             {"image_path": os.path.join(images_dir, "no.png"),
                              "question": "?"})
        assert status == 400 and "no.png" not in body["error"]

        # non-loopback + no root: image_path off, image_b64 still works
        server.image_root = None
        server._loopback = False
        status, body = _call(server, "POST", "/v1/ask",
                             {"image_path": images[0], "question": "?"})
        assert status == 400 and "image_b64" in body["error"]
        b64 = base64.b64encode(open(images[0], "rb").read()).decode()
        status, body = _call(server, "POST", "/v1/ask",
                             {"image_b64": b64, "question": "?"})
        assert status == 200 and "answer" in body
    finally:
        server.image_root = None
        server._loopback = True
