"""Serving layer (clip_dplm_tpu/serving): micro-batcher coalescing + error
propagation, embed-service parity with a direct forward across length
buckets, variable-length DPLM generation, and the HTTP server end-to-end.
The reference has no serving path (its embedding loops are offline notebook
cells, tf nb cell 21); this subsystem is deployment-side new build."""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import DPLMConfig, ESMConfig
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.dplm import DPLM, sample
from clip_dplm_tpu.models.esm import ESMTower
from clip_dplm_tpu.serving import (
    EmbedService,
    GenerateService,
    MicroBatcher,
    make_server,
)


# ---------------------------------------------------------------------------
# MicroBatcher
# ---------------------------------------------------------------------------


def test_microbatcher_coalesces_and_preserves_order():
    seen_batches = []

    def batch_fn(xs):
        seen_batches.append(list(xs))
        return [x * 2 for x in xs]

    mb = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=50.0)
    try:
        futs = [mb.submit(i) for i in range(20)]
        results = [f.result(timeout=10) for f in futs]
        assert results == [2 * i for i in range(20)]
        stats = mb.stats()
        assert stats["requests"] == 20
        # pre-filled queue + 50 ms window: must coalesce into < 20 batches
        assert stats["batches"] < 20
        assert max(len(b) for b in seen_batches) <= 8
        # every payload routed exactly once, per-request results matched
        assert sorted(x for b in seen_batches for x in b) == list(range(20))
    finally:
        mb.close()


def test_microbatcher_error_propagates_then_recovers():
    def batch_fn(xs):
        if any(x == "bad" for x in xs):
            raise RuntimeError("poison")
        return xs

    mb = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="poison"):
            mb("bad", timeout=10)
        assert mb("ok", timeout=10) == "ok"
        assert mb.stats()["errors"] == 1
    finally:
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit("after close")


def test_microbatcher_concurrent_submitters():
    mb = MicroBatcher(lambda xs: [x + 1 for x in xs],
                      max_batch=16, max_wait_ms=20.0)
    results = {}

    def client(i):
        results[i] = mb(i, timeout=10)

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: i + 1 for i in range(32)}
        assert mb.stats()["mean_batch_size"] > 1.0
    finally:
        mb.close()


# ---------------------------------------------------------------------------
# EmbedService
# ---------------------------------------------------------------------------


def _tiny_tower():
    cfg = ESMConfig(d_model=32, num_layers=1, num_heads=2, max_len=64)
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks = jnp.zeros((1, 8), jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), toks, jnp.ones((1, 8), bool))
    return tower, variables


def test_embed_service_matches_direct_forward():
    tower, variables = _tiny_tower()
    svc = EmbedService(tower, variables, max_len=64, max_batch=4,
                       max_wait_ms=1.0, buckets=[16, 32, 64])
    seqs = ["MKTAYIAKQR", "LA", "GVSERTIDPKQNFYMHWC"]
    try:
        got = svc.embed(seqs, timeout=30)
        assert got.shape[0] == 3
        # direct forward in ONE jitted batched call (mask-invariance of the
        # tower is covered by test_esm; this test checks service == direct)
        toks, mask = protein.tokenize_batch(seqs, pad_multiple=1)
        want = np.asarray(jax.jit(
            lambda t, m: tower.apply(variables, t, m,
                                     pooling="mean_residues")
        )(jnp.asarray(toks), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    finally:
        svc.close()


def test_embed_service_rejects_empty():
    tower, variables = _tiny_tower()
    svc = EmbedService(tower, variables, max_len=64, max_batch=2,
                       max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError):
            svc.embed([])
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# variable-length sampling + GenerateService
# ---------------------------------------------------------------------------


def _tiny_dplm():
    cfg = DPLMConfig(d_model=32, num_layers=1, num_heads=2, max_len=32,
                     num_diffusion_steps=4)
    model = DPLM(cfg=cfg, dtype=jnp.float32)
    toks = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]
    return model, params


def test_sample_with_per_row_lengths():
    model, params = _tiny_dplm()
    lengths = jnp.asarray([3, 8, 5], jnp.int32)
    toks, conf = sample(model, params, jax.random.PRNGKey(1), batch_size=3,
                        length=8, lengths=lengths)
    toks = np.asarray(toks)
    assert toks.shape == (3, 10)
    for i, L in enumerate([3, 8, 5]):
        assert toks[i, 0] == protein.CLS_IDX
        assert toks[i, L + 1] == protein.EOS_IDX
        inner = toks[i, 1 : L + 1]
        assert ((inner >= 4) & (inner <= 23)).all(), inner
        assert (toks[i, L + 2 :] == protein.PAD_IDX).all()
    # uniform lengths == the default full-length path
    full, _ = sample(model, params, jax.random.PRNGKey(2), batch_size=2,
                     length=6)
    full_via_lengths, _ = sample(model, params, jax.random.PRNGKey(2),
                                 batch_size=2, length=6,
                                 lengths=jnp.asarray([6, 6], jnp.int32))
    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray(full_via_lengths))


def test_sample_clamps_oversized_lengths():
    """lengths[i] > length must clamp to the padded maximum instead of
    silently producing a row with no <eos> (the eos position would land
    beyond the last column and residues would bleed into the pad region)."""
    model, params = _tiny_dplm()
    toks, _ = sample(model, params, jax.random.PRNGKey(3), batch_size=2,
                     length=6, lengths=jnp.asarray([50, 3], jnp.int32))
    toks = np.asarray(toks)
    assert toks[0, 7] == protein.EOS_IDX  # clamped to length=6 -> eos last
    assert ((toks[0, 1:7] >= 4) & (toks[0, 1:7] <= 23)).all()
    assert toks[1, 4] == protein.EOS_IDX  # unclamped row unaffected


def test_sample_rejects_bad_lengths_shape():
    model, params = _tiny_dplm()
    with pytest.raises(ValueError, match="lengths"):
        sample(model, params, jax.random.PRNGKey(0), batch_size=3, length=8,
               lengths=jnp.asarray([3, 8], jnp.int32))


def test_generate_service_mixed_lengths():
    model, params = _tiny_dplm()
    svc = GenerateService(model, params, max_len=10, max_batch=4,
                          max_wait_ms=1.0, num_steps=4)
    try:
        seqs, conf = svc.generate([4, 9, 2], timeout=60)
        assert [len(s) for s in seqs] == [4, 9, 2]
        residues = set("LAGVSERTIDPKQNFYMHWC")
        for s in seqs:
            assert set(s) <= residues, s
        assert all(np.isfinite(c) for c in conf)
        with pytest.raises(ValueError, match="outside"):
            svc.generate([11])
        with pytest.raises(ValueError, match="outside"):
            svc.generate([0])
    finally:
        svc.close()


def _tower_scorer(tower, variables):
    return lambda toks, mask: tower.apply(
        variables, toks, mask, pooling="mean_residues")


def test_generate_service_guided():
    """Guided lane end-to-end: best-of-K CLIP-guided sampling through the
    service, the returned score IS the cosine of the returned sequence
    against the condition, and the condition_id registry resolves."""
    model, params = _tiny_dplm()
    tower, variables = _tiny_tower()
    cond = np.linspace(-1.0, 1.0, 32).astype(np.float32)
    svc = GenerateService(model, params, max_len=10, max_batch=4,
                          max_wait_ms=1.0, num_steps=4,
                          scorer=_tower_scorer(tower, variables),
                          num_candidates=3, conditions={"motif": cond})
    try:
        seqs, scores = svc.generate([4, 7], condition=cond, timeout=120)
        assert [len(s) for s in seqs] == [4, 7]
        residues = set("LAGVSERTIDPKQNFYMHWC")
        assert all(set(s) <= residues for s in seqs)
        assert all(-1.0 <= c <= 1.0 for c in scores)  # cosine similarity
        # the score must be the actual CLIP score of the delivered sequence
        for s, score in zip(seqs, scores):
            toks, mask = protein.tokenize_batch([s], pad_multiple=12)
            emb = np.asarray(tower.apply(
                variables, jnp.asarray(toks), jnp.asarray(mask),
                pooling="mean_residues"))[0]
            want = float(
                emb @ cond / (np.linalg.norm(emb) * np.linalg.norm(cond)))
            assert abs(want - score) < 2e-3, (want, score)
        # registry path resolves to the same program
        seqs2, scores2 = svc.generate([4, 7], condition_id="motif",
                                      timeout=120)
        assert [len(s) for s in seqs2] == [4, 7]
        assert all(-1.0 <= c <= 1.0 for c in scores2)
        with pytest.raises(ValueError, match="unknown condition_id"):
            svc.generate([4], condition_id="nope")
        with pytest.raises(ValueError, match="not both"):
            svc.generate([4], condition=cond, condition_id="motif")
        with pytest.raises(ValueError, match="finite"):
            svc.generate([4], condition=[np.nan] * 32)
    finally:
        svc.close()


def test_generate_service_guided_requires_scorer():
    model, params = _tiny_dplm()
    svc = GenerateService(model, params, max_len=8, max_batch=2,
                          max_wait_ms=1.0, num_steps=2)
    try:
        with pytest.raises(ValueError, match="scorer"):
            svc.generate([4], condition=np.ones(8, np.float32))
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# HTTP server end-to-end
# ---------------------------------------------------------------------------


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read().decode())


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_server_end_to_end():
    tower, variables = _tiny_tower()
    embed_svc = EmbedService(tower, variables, max_len=64, max_batch=4,
                             max_wait_ms=1.0, buckets=[32, 64])
    model, params = _tiny_dplm()
    gen_svc = GenerateService(model, params, max_len=10, max_batch=4,
                              max_wait_ms=1.0, num_steps=4)
    server = make_server(embed=embed_svc, generate=gen_svc, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        status, body = _get(f"{base}/healthz")
        assert status == 200 and body == {"ok": True}

        status, body = _post(f"{base}/v1/embed",
                             {"sequences": ["MKTAYIAK", "LAGV"]})
        assert status == 200
        emb = np.asarray(body["embeddings"], np.float32)
        assert emb.shape == (2, body["dim"])
        toks, mask = protein.tokenize_batch(["MKTAYIAK"], pad_multiple=1)
        want = np.asarray(tower.apply(
            variables, jnp.asarray(toks), jnp.asarray(mask),
            pooling="mean_residues"))[0]
        np.testing.assert_allclose(emb[0], want, rtol=2e-4, atol=2e-4)

        status, body = _post(f"{base}/v1/generate", {"lengths": [5, 8]})
        assert status == 200
        assert [len(s) for s in body["sequences"]] == [5, 8]
        assert len(body["confidence"]) == 2

        status, body = _post(f"{base}/v1/generate", {"num": 2, "length": 6})
        assert status == 200
        assert [len(s) for s in body["sequences"]] == [6, 6]

        status, body = _get(f"{base}/v1/stats")
        assert status == 200
        assert body["embed"]["requests"] >= 2
        assert body["generate"]["requests"] >= 4

        # malformed requests -> 400, unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/v1/embed", {"sequences": []})
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/v1/generate", {"lengths": [999]})
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/v1/nope", {})
        assert err.value.code == 404
    finally:
        server.shutdown()
        embed_svc.close()
        gen_svc.close()


def test_http_guided_generate_end_to_end():
    """Guided /v1/generate over HTTP: inline condition vectors, the
    condition_id registry, the guided-lane stats, and error paths."""
    model, params = _tiny_dplm()
    tower, variables = _tiny_tower()
    cond = np.linspace(-1.0, 1.0, 32).astype(np.float32)
    gen_svc = GenerateService(model, params, max_len=8, max_batch=2,
                              max_wait_ms=1.0, num_steps=2,
                              scorer=_tower_scorer(tower, variables),
                              num_candidates=2, conditions={"c0": cond})
    server = make_server(generate=gen_svc, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        status, body = _post(f"{base}/v1/generate",
                             {"lengths": [5], "condition": cond.tolist()})
        assert status == 200 and body["guided"] is True
        assert [len(s) for s in body["sequences"]] == [5]
        assert len(body["clip_scores"]) == 1
        assert -1.0 <= body["clip_scores"][0] <= 1.0

        status, body = _post(f"{base}/v1/generate",
                             {"num": 2, "length": 4, "condition_id": "c0"})
        assert status == 200 and body["guided"] is True
        assert [len(s) for s in body["sequences"]] == [4, 4]

        # unguided requests still ride the plain lane on the same service
        status, body = _post(f"{base}/v1/generate", {"lengths": [3]})
        assert status == 200 and "confidence" in body

        status, body = _get(f"{base}/v1/stats")
        assert status == 200
        assert body["generate_guided"]["requests"] >= 3
        assert body["generate"]["requests"] >= 1

        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/v1/generate",
                  {"lengths": [4], "condition_id": "nope"})
        assert err.value.code == 400
    finally:
        server.shutdown()
        gen_svc.close()


def test_http_concurrent_clients_share_batches():
    """N concurrent HTTP clients coalesce onto shared device programs."""
    tower, variables = _tiny_tower()
    embed_svc = EmbedService(tower, variables, max_len=32, max_batch=8,
                             max_wait_ms=150.0, buckets=[32])
    server = make_server(embed=embed_svc, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    # warm the compile so the batching window isn't dwarfed by tracing
    _post(f"{base}/v1/embed", {"sequences": ["LAGV"]})
    results = {}

    def client(i):
        results[i] = _post(f"{base}/v1/embed", {"sequences": ["MKTAYIAK"]})

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(status == 200 for status, _ in results.values())
        first = np.asarray(results[0][1]["embeddings"])
        for status, body in results.values():
            np.testing.assert_allclose(
                np.asarray(body["embeddings"]), first, rtol=1e-5, atol=1e-5)
        stats = embed_svc.batcher.stats()
        assert stats["batches"] < stats["requests"]
    finally:
        server.shutdown()
        embed_svc.close()
