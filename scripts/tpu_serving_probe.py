"""Serving-path throughput on the real chip: concurrent HTTP clients against
experiments/serve's embed endpoint (EmbedService + MicroBatcher + stdlib
HTTP), measuring end-to-end sequences/s including tokenization, batching
waits, device dispatch and JSON marshalling.

Run (TPU):    timeout 570 python scripts/tpu_serving_probe.py
CPU check:    python scripts/tpu_serving_probe.py --platform cpu --requests 32

Honest-timing notes (CLAUDE.md): every batch ends in a host fetch
(np.asarray in EmbedService._run_batch), so the axon tunnel's async quirks
cannot fake completion; wall-clock covers whole requests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--esm", default="esm2_t6_8M")
    parser.add_argument("--seq-len", type=int, default=200)
    parser.add_argument("--max-batch", type=int, default=64)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--requests", type=int, default=512)
    parser.add_argument("--clients", type=int, default=32)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--out", default=None, help="write the JSON line here too")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from clip_dplm_tpu.data.protein import random_protein
    from clip_dplm_tpu.models.esm import ESMTower, esm_config_from_name
    from clip_dplm_tpu.serving import EmbedService, make_server

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")

    bucket = 1
    while bucket < args.seq_len + 2:
        bucket *= 2
    cfg = esm_config_from_name(args.esm, max_len=bucket)
    tower = ESMTower(cfg=cfg, dtype=jnp.bfloat16)
    toks = jnp.zeros((1, 8), jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), toks, jnp.ones((1, 8), bool))
    svc = EmbedService(tower, variables, max_len=bucket,
                       max_batch=args.max_batch,
                       max_wait_ms=args.max_wait_ms, buckets=[bucket])
    server = make_server(embed=svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_port}"

    rng = np.random.default_rng(0)
    seqs = [random_protein(rng, args.seq_len) for _ in range(256)]

    def post(seq: str) -> int:
        req = urllib.request.Request(
            f"{base}/v1/embed",
            data=json.dumps({"sequences": [seq]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read().decode())
            return len(body["embeddings"][0])

    # warm: compile the (max_batch, bucket) program
    dim = post(seqs[0])
    print(f"warm ok: dim={dim}, bucket={bucket}")

    n_done = [0]
    lock = threading.Lock()

    def client(worker: int) -> None:
        i = worker
        while True:
            with lock:
                if n_done[0] >= args.requests:
                    return
                n_done[0] += 1
            post(seqs[i % len(seqs)])
            i += args.clients

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(w,))
               for w in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0

    stats = svc.batcher.stats()
    line = {
        "metric": "serving_embed_throughput",
        "model": args.esm,
        "seq_len": args.seq_len,
        "clients": args.clients,
        "requests": args.requests,
        "seqs_per_sec": round(args.requests / dt, 2),
        "residues_per_sec": round(args.requests * args.seq_len / dt, 1),
        "mean_batch_size": stats["mean_batch_size"],
        "batches": stats["batches"],
        "max_batch": args.max_batch,
        "note": "end-to-end HTTP: tokenize + micro-batch + device + JSON",
    }
    print(json.dumps(line))
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(line) + "\n")
    server.shutdown()
    svc.close()


if __name__ == "__main__":
    main()
