"""Production serving: micro-batching inference services + a JSON/HTTP server.

The reference has no serving story — its embedding pipelines are offline
notebook loops (tf nb cell 21; old/encoders.py:15-31), re-tokenizing and
re-dispatching one batch at a time. This module is the deployment-side
counterpart the framework adds, built around the two facts that dominate
TPU serving:

  * XLA compiles one program per shape. Every service here pads to a FIXED
    batch size and a small set of length buckets, so steady-state traffic
    never recompiles (compile count <= len(buckets)).
  * Chips like big batches. Individual requests are coalesced by a
    `MicroBatcher` — a single worker thread per service drains a queue for
    up to `max_wait_ms`, runs ONE device program for the whole group, and
    resolves each caller's future. Concurrent clients share MXU passes
    instead of serializing tiny dispatches.

Services:
  * `EmbedService` — protein sequences -> pooled ESM-tower embeddings
    (the serving form of experiments/embed.py's offline loop).
  * `GenerateService` — DPLM sampler with mixed per-request lengths in one
    padded program (models/dplm.py `sample(lengths=...)`); optionally
    CLIP-guided (best-of-K against a conditioning embedding,
    `clip_guided_sample`) via a second, separately-coalesced batcher lane.

`make_server` exposes them over stdlib HTTP (ThreadingHTTPServer — each
request blocks on its future while the batcher aggregates across threads):
  GET  /healthz                 -> {"ok": true}
  GET  /v1/stats                -> per-service batcher occupancy stats
  POST /v1/embed    {"sequences": [...]}            -> {"embeddings": ...}
  POST /v1/generate {"lengths": [...]} or {"num": N, "length": L}
                                 -> {"sequences": [...], "confidence": [...]}
                    + optional {"condition": [d floats]} or
                      {"condition_id": "name"} for CLIP-guided sampling
                                 -> {"sequences", "clip_scores", "guided"}

No external dependencies — json + http.server only, deployable on a TPU VM
as `python -m clip_dplm_tpu.experiments.serve`.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# request coalescing
# ---------------------------------------------------------------------------


class MicroBatcher:
    """Coalesce single-item requests into device-sized batches.

    `batch_fn(payloads) -> results` is called on ONE worker thread with
    1..max_batch payloads; it must return exactly one result per payload.
    `submit` returns a Future; `__call__` submits and blocks.
    """

    def __init__(
        self,
        batch_fn: Callable[[List[Any]], Sequence[Any]],
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        name: str = "batcher",
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._batch_fn = batch_fn
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1000.0
        self.name = name
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.requests_total = 0
        self.batches_total = 0
        self.errors_total = 0
        self._worker = threading.Thread(
            target=self._run, name=f"{name}-worker", daemon=True)
        self._worker.start()

    def submit(self, payload: Any) -> Future:
        if self._stop.is_set():
            raise RuntimeError(f"{self.name} is closed")
        fut: Future = Future()
        self._queue.put((payload, fut))
        return fut

    def __call__(self, payload: Any, timeout: Optional[float] = None) -> Any:
        return self.submit(payload).result(timeout=timeout)

    def map(self, payloads: Sequence[Any],
            timeout: Optional[float] = None) -> List[Any]:
        futs = [self.submit(p) for p in payloads]
        return [f.result(timeout=timeout) for f in futs]

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            b = max(self.batches_total, 1)
            return {
                "name": self.name,
                "requests": self.requests_total,
                "batches": self.batches_total,
                "errors": self.errors_total,
                "mean_batch_size": round(self.requests_total / b, 3),
                "max_batch": self._max_batch,
            }

    def close(self, timeout: float = 5.0) -> None:
        self._stop.set()
        self._worker.join(timeout=timeout)
        # fail anything still queued
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError(f"{self.name} closed"))

    # -- worker ------------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self._max_wait
            while len(batch) < self._max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            payloads = [p for p, _ in batch]
            try:
                results = self._batch_fn(payloads)
                if len(results) != len(payloads):
                    raise RuntimeError(
                        f"batch_fn returned {len(results)} results for "
                        f"{len(payloads)} payloads")
            except Exception as exc:  # propagate to every caller in the batch
                with self._lock:
                    self.errors_total += 1
                    self.batches_total += 1
                    self.requests_total += len(batch)
                for _, fut in batch:
                    fut.set_exception(exc)
                continue
            with self._lock:
                self.batches_total += 1
                self.requests_total += len(batch)
            for (_, fut), res in zip(batch, results):
                fut.set_result(res)


def _length_buckets(max_len: int, smallest: int = 32) -> List[int]:
    """Power-of-two padded lengths up to max_len (bounded compile count)."""
    buckets, b = [], smallest
    while b < max_len:
        buckets.append(b)
        b *= 2
    buckets.append(max_len)
    return buckets


# ---------------------------------------------------------------------------
# embedding service
# ---------------------------------------------------------------------------


class EmbedService:
    """Sequences -> pooled embeddings with static shapes.

    Batches are padded to `max_batch` rows and the token dimension to the
    smallest length bucket that fits the longest sequence in the group, so
    at most len(buckets) programs are ever compiled. Padding rows/tokens are
    masked — results are identical to a solo forward (test_serving checks
    this against a direct tower.apply).
    """

    def __init__(
        self,
        tower,
        variables,
        pooling: str = "mean_residues",
        max_len: int = 1024,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        buckets: Optional[Sequence[int]] = None,
    ):
        import jax
        import jax.numpy as jnp

        self._tower = tower
        self._variables = variables
        self.max_len = max_len
        self.max_batch = max_batch
        self.buckets = sorted(buckets) if buckets else _length_buckets(max_len)
        if self.buckets[-1] < max_len:
            self.buckets.append(max_len)
        self._apply = jax.jit(
            lambda t, m: tower.apply(variables, t, m, pooling=pooling))
        self._jnp = jnp
        self.batcher = MicroBatcher(
            self._run_batch, max_batch=max_batch,
            max_wait_ms=max_wait_ms, name="embed")

    def embed(self, sequences: Sequence[str],
              timeout: Optional[float] = None) -> np.ndarray:
        """Blocking public API; safe from many threads concurrently."""
        if not sequences:
            raise ValueError("no sequences given")
        return np.stack(self.batcher.map(list(sequences), timeout=timeout))

    def _run_batch(self, seqs: List[str]) -> List[np.ndarray]:
        from clip_dplm_tpu.data.protein import tokenize_batch

        toks, mask = tokenize_batch(
            list(seqs) + ["L"] * (self.max_batch - len(seqs)),
            max_len=self.max_len, pad_multiple=1)
        S = next(b for b in self.buckets if b >= toks.shape[1])
        if toks.shape[1] < S:
            pad = S - toks.shape[1]
            toks = np.pad(toks, ((0, 0), (0, pad)), constant_values=1)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        emb = np.asarray(
            self._apply(self._jnp.asarray(toks), self._jnp.asarray(mask)),
            np.float32)
        return list(emb[: len(seqs)])

    def close(self) -> None:
        self.batcher.close()


# ---------------------------------------------------------------------------
# generation service
# ---------------------------------------------------------------------------


class GenerateService:
    """DPLM sampling service: mixed request lengths, one padded program.

    Every batch runs `sample(batch_size=max_batch, length=max_len,
    lengths=per-row)` — a single compiled program regardless of the length
    mix (dplm.py lengths support). Returns (sequence, mean residue logprob)
    per request.

    **Guided mode** (the north star's serving form — BASELINE.json config 5,
    "contrastive score guidance"): construct with `scorer` (a bound
    `(tokens, mask) -> (B, d)` protein-embedding fn, e.g. the CLIP protein
    tower) and pass a conditioning embedding per request. Guided requests run
    `clip_guided_sample` — best-of-`num_candidates` reranking against the
    per-row condition — through a SECOND batcher with its own fixed-shape
    program, so guided and unguided traffic never mix in one device batch
    (their programs differ) yet each coalesces within its own lane.
    Conditioning embeddings may also be registered up front in `conditions`
    (name -> (d,) vector) and referenced by id, so steady-state clients ship
    a short string instead of a float vector per request.
    """

    def __init__(
        self,
        model,
        params,
        max_len: int = 126,
        num_steps: Optional[int] = None,
        temperature: float = 1.0,
        max_batch: int = 32,
        max_wait_ms: float = 10.0,
        seed: int = 0,
        scorer: Optional[Callable] = None,
        num_candidates: int = 4,
        conditions: Optional[Dict[str, Any]] = None,
    ):
        import jax

        from clip_dplm_tpu.models.dplm import clip_guided_sample, sample

        self.max_len = max_len
        self.max_batch = max_batch
        self._key = jax.random.PRNGKey(seed)
        self._jax = jax

        def run(key, lengths):
            return sample(model, params, key, batch_size=max_batch,
                          length=max_len, num_steps=num_steps,
                          temperature=temperature, lengths=lengths)

        self._sample = jax.jit(run)
        self.batcher = MicroBatcher(
            self._run_batch, max_batch=max_batch,
            max_wait_ms=max_wait_ms, name="generate")

        self.conditions = {
            k: np.asarray(v, np.float32).reshape(-1)
            for k, v in (conditions or {}).items()
        }
        self.guided_batcher: Optional[MicroBatcher] = None
        if scorer is not None:
            from clip_dplm_tpu.models.guided_generation import make_clip_scorer

            def run_guided(key, lengths, cond):
                # cond: (max_batch, d) per-row conditioning; zero rows
                # (padding) l2-normalize to zero and score 0 everywhere,
                # so they never perturb real rows' argmax.
                score_fn = make_clip_scorer(scorer, cond)
                return clip_guided_sample(
                    model, params, key, score_fn, batch_size=max_batch,
                    length=max_len, num_candidates=num_candidates,
                    num_steps=num_steps, temperature=temperature,
                    lengths=lengths)

            self._sample_guided = jax.jit(run_guided)
            self.guided_batcher = MicroBatcher(
                self._run_batch_guided, max_batch=max_batch,
                max_wait_ms=max_wait_ms, name="generate_guided")

    def _resolve_condition(self, condition, condition_id):
        if condition is not None and condition_id is not None:
            raise ValueError(
                "pass either condition or condition_id, not both")
        if condition_id is not None:
            if condition_id not in self.conditions:
                raise ValueError(
                    f"unknown condition_id {condition_id!r}; registered: "
                    f"{sorted(self.conditions)}")
            return self.conditions[condition_id]
        cond = np.asarray(condition, np.float32).reshape(-1)
        if cond.size == 0 or not np.all(np.isfinite(cond)):
            raise ValueError(
                "condition must be a non-empty finite vector")
        return cond

    def generate(self, lengths: Sequence[int],
                 timeout: Optional[float] = None,
                 condition=None, condition_id: Optional[str] = None):
        """Blocking: one generated sequence per requested length.

        Unguided: returns (sequences, per-sequence mean residue logprob).
        With `condition` (a (d,) embedding) or `condition_id` (a name
        registered at construction): CLIP-guided best-of-K sampling toward
        that embedding; returns (sequences, per-sequence CLIP scores).
        """
        for L in lengths:
            if not 1 <= int(L) <= self.max_len:
                raise ValueError(
                    f"length {L} outside [1, {self.max_len}] "
                    f"(service max_len)")
        lengths = [int(L) for L in lengths]
        if condition is None and condition_id is None:
            out = self.batcher.map(lengths, timeout=timeout)
            return [s for s, _ in out], [c for _, c in out]
        if self.guided_batcher is None:
            raise ValueError(
                "guided generation not configured: construct "
                "GenerateService with scorer=...")
        cond = self._resolve_condition(condition, condition_id)
        out = self.guided_batcher.map(
            [(L, cond) for L in lengths], timeout=timeout)
        return [s for s, _ in out], [c for _, c in out]

    def _run_batch(self, lengths: List[int]):
        from clip_dplm_tpu.data.protein import detokenize

        row_lengths = np.ones((self.max_batch,), np.int32)
        row_lengths[: len(lengths)] = lengths
        self._key, sub = self._jax.random.split(self._key)
        toks, conf = self._sample(sub, row_lengths)
        toks = np.asarray(toks)
        conf = np.asarray(conf, np.float32)
        out = []
        for i, L in enumerate(lengths):
            seq = detokenize(toks[i])
            mean_logp = float(conf[i, 1 : L + 1].mean())
            out.append((seq, mean_logp))
        return out

    def _run_batch_guided(self, payloads: List[Any]):
        from clip_dplm_tpu.data.protein import detokenize

        dims = {p[1].shape[0] for p in payloads}
        if len(dims) != 1:
            raise ValueError(
                f"conditioning embeddings in one batch must share a "
                f"dimension; got {sorted(dims)}")
        d = dims.pop()
        row_lengths = np.ones((self.max_batch,), np.int32)
        cond = np.zeros((self.max_batch, d), np.float32)
        for i, (L, c) in enumerate(payloads):
            row_lengths[i] = L
            cond[i] = c
        self._key, sub = self._jax.random.split(self._key)
        toks, scores = self._sample_guided(sub, row_lengths, cond)
        toks = np.asarray(toks)
        scores = np.asarray(scores, np.float32)
        return [(detokenize(toks[i]), float(scores[i]))
                for i in range(len(payloads))]

    def close(self) -> None:
        self.batcher.close()
        if self.guided_batcher is not None:
            self.guided_batcher.close()


# ---------------------------------------------------------------------------
# HTTP front end
# ---------------------------------------------------------------------------


def make_server(
    embed: Optional[EmbedService] = None,
    generate: Optional[GenerateService] = None,
    host: str = "127.0.0.1",
    port: int = 0,
    request_timeout: float = 300.0,
) -> ThreadingHTTPServer:
    """Build (not start) a threading HTTP server over the given services.

    Call `.serve_forever()` (blocking) or run it in a thread; `.server_port`
    holds the bound port (useful with port=0).
    """

    services = {"embed": embed, "generate": generate}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default; stats endpoint instead
            pass

        def _send(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> Dict[str, Any]:
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                return {}
            return json.loads(self.rfile.read(n).decode())

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/v1/stats":
                stats = {
                    name: svc.batcher.stats()
                    for name, svc in services.items() if svc is not None
                }
                gen = services["generate"]
                if gen is not None and gen.guided_batcher is not None:
                    stats["generate_guided"] = gen.guided_batcher.stats()
                self._send(200, stats)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                req = self._read_json()
            except (ValueError, json.JSONDecodeError) as exc:
                self._send(400, {"error": f"bad JSON: {exc}"})
                return
            try:
                if self.path == "/v1/embed":
                    self._embed(req)
                elif self.path == "/v1/generate":
                    self._generate(req)
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError, TypeError) as exc:
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # device/batch failures
                self._send(500, {"error": str(exc)})

        def _embed(self, req):
            svc = services["embed"]
            if svc is None:
                self._send(503, {"error": "embed service not configured"})
                return
            seqs = req.get("sequences")
            if not isinstance(seqs, list) or not seqs or not all(
                    isinstance(s, str) and s for s in seqs):
                raise ValueError(
                    '"sequences" must be a non-empty list of strings')
            emb = svc.embed(seqs, timeout=request_timeout)
            self._send(200, {
                "embeddings": emb.tolist(),
                "dim": int(emb.shape[1]),
            })

        def _generate(self, req):
            svc = services["generate"]
            if svc is None:
                self._send(503, {"error": "generate service not configured"})
                return
            if "lengths" in req:
                lengths = req["lengths"]
                if not isinstance(lengths, list) or not lengths:
                    raise ValueError('"lengths" must be a non-empty list')
            else:
                num = int(req.get("num", 1))
                if not 1 <= num <= 1024:
                    raise ValueError('"num" must be in [1, 1024]')
                lengths = [int(req.get("length", svc.max_len))] * num
            condition = req.get("condition")
            condition_id = req.get("condition_id")
            if condition is not None or condition_id is not None:
                seqs, scores = svc.generate(
                    lengths, timeout=request_timeout,
                    condition=condition, condition_id=condition_id)
                self._send(200, {"sequences": seqs, "clip_scores": scores,
                                 "guided": True})
            else:
                seqs, conf = svc.generate(lengths, timeout=request_timeout)
                self._send(200, {"sequences": seqs, "confidence": conf})

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True
    return server
