"""Drive the HTTP serving layer through real sockets."""

import json
import urllib.request

import pytest


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_text_retrieval_service(tmp_path):
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    words = ["the", "dog", "cat", "runs", "sits", "fast", "sky", "red"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=32)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder
    from nexus_tpu.serve import TextRetrievalService

    emb = TextEmbedder(model_name_or_path=str(d), batch_size=4, max_length=16)
    corpus = {"d1": "the dog runs fast", "d2": "the cat sits", "d3": "red sky"}
    svc = TextRetrievalService(emb, corpus, port=0).start()
    try:
        out = _post(svc.port, "/search", {"query": "dog runs", "top_k": 2})
        assert len(out["hits"]) == 2
        assert out["hits"][0]["doc_id"] in corpus
        assert "latency_ms" in out
        # health endpoint
        with urllib.request.urlopen(f"http://127.0.0.1:{svc.port}/health", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
        # unknown route -> 404 json error
        try:
            _post(svc.port, "/nope", {})
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # malformed request -> 500 json error, not a crash
        try:
            _post(svc.port, "/search", {"wrong_key": 1})
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        svc.stop()
