"""Inference server CLI — `python -m clip_dplm_tpu.experiments.serve`.

Serves pooled protein embeddings (ESM tower) and DPLM generation over HTTP
with micro-batched, recompile-free device dispatch (clip_dplm_tpu/serving).
The deployment-side counterpart of the reference's offline embedding loops
(tf nb cell 21, old/encoders.py:15-31), which have no serving path at all.

  # random-weight smoke server (embeddings + a fresh tiny DPLM)
  python -m clip_dplm_tpu.experiments.serve --esm esm2_t6_8M --port 8000 \
      --dplm-random --allow-random

  # production: converted checkpoints via a pretrained bundle
  python -m clip_dplm_tpu.experiments.serve --bundle runs/bundle --port 8000

  curl -s localhost:8000/healthz
  curl -s -XPOST localhost:8000/v1/embed -d '{"sequences": ["MKTAYIAK"]}'
  curl -s -XPOST localhost:8000/v1/generate -d '{"lengths": [60, 124]}'
  curl -s localhost:8000/v1/stats
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def build_services(args):
    """(embed_service | None, generate_service | None) per CLI flags."""
    import jax.numpy as jnp

    from clip_dplm_tpu.models.esm import ESMTower, esm_config_from_name
    from clip_dplm_tpu.serving import EmbedService, GenerateService

    embed_svc = None
    embed_tower = embed_variables = None
    if not args.no_embed:
        if args.bundle:
            from clip_dplm_tpu.utils.pretrained import load_pretrained

            cfg, _, params = load_pretrained(args.bundle)
            tower = ESMTower(cfg=cfg.esm, dtype=jnp.bfloat16)
            variables = {"params": params["esm_tower"]} \
                if "esm_tower" in params else {"params": params}
        else:
            if not args.allow_random:
                raise SystemExit(
                    "no --bundle given: pass --allow-random to serve RANDOM "
                    "weights (smoke/bench only), or convert a checkpoint "
                    "(models.esm.convert_esm_torch_params)")
            esm_cfg = esm_config_from_name(args.esm, max_len=args.max_len)
            tower = ESMTower(cfg=esm_cfg, dtype=jnp.bfloat16)
            toks = jnp.zeros((1, 8), jnp.int32)
            variables = tower.init(
                jax.random.PRNGKey(0), toks, jnp.ones((1, 8), bool))
            print("WARNING: serving RANDOM embedding weights")
        embed_svc = EmbedService(
            tower, variables, pooling=args.pooling, max_len=args.max_len,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
        embed_tower, embed_variables = tower, variables

    gen_svc = None
    if args.dplm_bundle or args.dplm_random:
        from clip_dplm_tpu.config import DPLMConfig
        from clip_dplm_tpu.models.dplm import DPLM

        if args.dplm_bundle:
            from clip_dplm_tpu.utils.pretrained import load_pretrained

            cfg, _, params = load_pretrained(args.dplm_bundle)
            model = DPLM(cfg=cfg.dplm)
            dplm_params = params["dplm"] if "dplm" in params else params
        else:
            cfg = DPLMConfig(d_model=args.dplm_d_model,
                             num_layers=args.dplm_layers,
                             num_heads=max(2, args.dplm_d_model // 64),
                             max_len=args.gen_max_len + 2)
            model = DPLM(cfg=cfg)
            toks = np.zeros((1, 8), np.int32)
            dplm_params = model.init(
                jax.random.PRNGKey(1), jax.numpy.asarray(toks))["params"]
            print("WARNING: serving RANDOM DPLM weights")
        # CLIP guidance for /v1/generate (north star config 5's serving
        # form): a protein scorer from a converted CLIP bundle, or — smoke
        # only — the embed tower itself.
        scorer_fn = None
        conditions = None
        if args.conditions_npz:
            data = np.load(args.conditions_npz)
            conditions = {k: data[k] for k in data.files}
        if args.scorer_bundle:
            from clip_dplm_tpu.models.layers import OptimizedProjectionHead
            from clip_dplm_tpu.utils.pretrained import load_pretrained

            scfg, _, sparams = load_pretrained(args.scorer_bundle)
            s_tower = ESMTower(cfg=scfg.esm, dtype=jnp.bfloat16)
            t_params = sparams["esm_tower"] if "esm_tower" in sparams \
                else sparams
            p_params = sparams.get("protein_proj") \
                if hasattr(sparams, "get") else None
            if p_params is not None:
                proj = OptimizedProjectionHead(
                    cfg=scfg.projection, dtype=jnp.bfloat16)

                def scorer_fn(toks, mask):
                    emb = s_tower.apply({"params": t_params}, toks, mask,
                                        pooling="mean_residues")
                    return proj.apply({"params": p_params}, emb)
            else:
                def scorer_fn(toks, mask):
                    return s_tower.apply({"params": t_params}, toks, mask,
                                         pooling="mean_residues")
        elif args.guided_random:
            if embed_tower is None:
                raise SystemExit(
                    "--guided-random reuses the embed tower as the scorer; "
                    "it cannot be combined with --no-embed")

            def scorer_fn(toks, mask):
                return embed_tower.apply(
                    embed_variables, toks, mask, pooling="mean_residues")

        gen_svc = GenerateService(
            model, dplm_params, max_len=args.gen_max_len,
            num_steps=args.gen_steps, temperature=args.gen_temperature,
            max_batch=args.gen_max_batch, max_wait_ms=args.max_wait_ms,
            scorer=scorer_fn, num_candidates=args.gen_candidates,
            conditions=conditions)
    return embed_svc, gen_svc


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--bundle", default=None,
                        help="pretrained bundle dir for the embed tower")
    parser.add_argument("--esm", default="esm2_t6_8M",
                        help="ESM family when no bundle is given")
    parser.add_argument("--allow-random", action="store_true",
                        help="permit serving random weights (smoke only)")
    parser.add_argument("--no-embed", action="store_true")
    parser.add_argument("--pooling", default="mean_residues",
                        choices=["mean_residues", "cls"])
    parser.add_argument("--max-len", type=int, default=1024)
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--dplm-bundle", default=None,
                        help="pretrained bundle dir for DPLM generation")
    parser.add_argument("--dplm-random", action="store_true",
                        help="serve a fresh random DPLM (smoke only)")
    parser.add_argument("--dplm-d-model", type=int, default=640)
    parser.add_argument("--dplm-layers", type=int, default=12)
    parser.add_argument("--gen-max-len", type=int, default=126)
    parser.add_argument("--gen-steps", type=int, default=None)
    parser.add_argument("--gen-temperature", type=float, default=1.0)
    parser.add_argument("--gen-max-batch", type=int, default=32)
    parser.add_argument("--scorer-bundle", default=None,
                        help="pretrained CLIP bundle (esm_tower + "
                             "protein_proj) scoring CLIP-guided generation")
    parser.add_argument("--guided-random", action="store_true",
                        help="guide /v1/generate with the (possibly random) "
                             "embed tower — smoke only")
    parser.add_argument("--gen-candidates", type=int, default=4,
                        help="best-of-K candidates for guided sampling")
    parser.add_argument("--conditions-npz", default=None,
                        help=".npz of named conditioning embeddings, "
                             "referenceable via condition_id")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.serving import make_server

    embed_svc, gen_svc = build_services(args)
    if embed_svc is None and gen_svc is None:
        raise SystemExit("nothing to serve: --no-embed without a DPLM flag")
    server = make_server(embed=embed_svc, generate=gen_svc,
                         host=args.host, port=args.port)
    endpoints = ["/healthz", "/v1/stats"]
    if embed_svc is not None:
        endpoints.append("/v1/embed")
    if gen_svc is not None:
        endpoints.append("/v1/generate")
    print(f"serving on http://{args.host}:{server.server_port} "
          f"({', '.join(endpoints)}) — ctrl-c to stop")
    # SIGTERM (spot preemption / orchestrator stop) drains cleanly like
    # ctrl-c: shutdown() lets in-flight requests finish, close() flushes
    # the micro-batchers. serve_forever polls, so shutdown from a handler
    # on the same thread would deadlock — hand it to a helper thread.
    import signal
    import threading

    signal.signal(signal.SIGTERM, lambda s, f: threading.Thread(
        target=server.shutdown, daemon=True).start())
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        if embed_svc is not None:
            embed_svc.close()
        if gen_svc is not None:
            gen_svc.close()


if __name__ == "__main__":
    main()
