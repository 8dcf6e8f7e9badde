"""ESM tower: numerical parity against HF transformers' EsmModel (rotary,
random weights — the checkpoint-conversion gate of BASELINE.json), tokenizer
round-trip, pooling semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import ESMConfig
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.esm import (
    ESMTower,
    convert_esm_torch_params,
    esm_config_from_name,
    rotary_embed,
)


def test_tokenizer_basic():
    ids = protein.tokenize("LAGV")
    assert ids[0] == protein.CLS_IDX and ids[-1] == protein.EOS_IDX
    assert len(ids) == 6
    # unknown residue -> unk
    ids2 = protein.tokenize("LAJ")  # J is not in the alphabet
    assert ids2[3] == protein.UNK_IDX


def test_tokenizer_uzob_replacement():
    ids = protein.tokenize("LUZB", replace_uzob=True)
    x = protein.TOKEN_TO_ID["X"]
    assert ids[2] == x and ids[3] == x and ids[4] == x


def test_tokenize_batch_shapes():
    toks, mask = protein.tokenize_batch(["LAGV", "LA"], pad_multiple=8)
    assert toks.shape == (2, 8)
    assert mask[0].sum() == 6 and mask[1].sum() == 4
    assert (toks[1, 4:] == protein.PAD_IDX).all()


def test_tokenizer_truncation():
    ids = protein.tokenize("L" * 100, max_len=16)
    assert len(ids) == 16
    assert ids[0] == protein.CLS_IDX and ids[-1] == protein.EOS_IDX


def test_rotary_identity_at_zero():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 4, 8)).astype(np.float32))
    out = rotary_embed(x[:, :, :1], jnp.arange(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :, :1]), atol=1e-6)


def test_rotary_bsd_matches_head_split():
    """rotary_embed_bsd == merge_heads(rotary_embed(split_heads(x))) — the
    packed-layout rotary used by the EsmBlock packed-qkv path."""
    from clip_dplm_tpu.models.esm import rotary_embed_bsd

    rng = np.random.default_rng(1)
    B, S, H, Dh = 3, 12, 4, 16
    x = jnp.asarray(rng.normal(size=(B, S, H * Dh)).astype(np.float32))
    pos = jnp.arange(S)
    got = rotary_embed_bsd(x, pos, H)
    xh = x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    want = rotary_embed(xh, pos).transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("rope_kernel", ["1", "0"])
def test_esm_block_packed_path_matches_split(monkeypatch, rope_kernel):
    """EsmBlock's packed short-S path (fused qkv matmul + rotary + qkv_proj
    kernel) matches the head-split fallback — values and grads — under
    interpret mode with the TPU dispatch forced on. rope_kernel=1 applies
    rotary inside the kernel; 0 uses the XLA rotary_embed_bsd rewrite."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_dplm_tpu.models.esm import EsmBlock
    from clip_dplm_tpu.ops import attention as attn_mod

    monkeypatch.setenv("CLIP_DPLM_ROPE_KERNEL", rope_kernel)
    rng = np.random.default_rng(2)
    B, S, D, H = 2, 64, 32, 4  # S >= 64 (packed-dispatch lower bound), Dh=8
    block = EsmBlock(d_model=D, num_heads=H, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    mask = jnp.asarray(np.arange(S)[None, :] < rng.integers(40, S, B)[:, None])
    pos = jnp.arange(S)
    params = block.init(jax.random.PRNGKey(0), x, mask, pos)["params"]
    w = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))

    def loss(p):
        out = block.apply({"params": p}, x, mask, pos)
        return jnp.sum(out * w)

    monkeypatch.setenv("CLIP_DPLM_SHORT_ATTN", "0")
    # fresh jit wrapper (env flag is baked at trace time; never share the
    # cache across arms) — eager dispatch dominated this arm's runtime
    ref, ref_grad = jax.jit(jax.value_and_grad(loss))(params)

    monkeypatch.setenv("CLIP_DPLM_SHORT_ATTN", "1")
    monkeypatch.setenv("CLIP_DPLM_SHORT_ATTN_G", "2")
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    # force the exact-recompute backward: the bf16 saved-probs error budget
    # is covered by the kernel-level tests; this test checks the BLOCK's
    # packed wiring (fused qkv matmul, packed rotary, param sharing) exactly
    import clip_dplm_tpu.ops.short_attention as sa_mod

    orig = sa_mod.fused_short_attention_qkv_proj
    monkeypatch.setattr(
        sa_mod, "fused_short_attention_qkv_proj",
        lambda *a, **kw: orig(*a, **{**kw, "save_probs": False}))
    with pltpu.force_tpu_interpret_mode():
        got, got_grad = jax.value_and_grad(loss)(params)

    # the forward's p@v matmul rounds probs to bf16 by design
    # (short_attention.py docstring) — the value carries ~1e-4 relative
    np.testing.assert_allclose(float(got), float(ref), rtol=5e-4)

    # primal (no-grad) path: the inference kernels skip residual writes
    # (o in VMEM scratch, no probs) — must match the same loss value
    with pltpu.force_tpu_interpret_mode():
        got_primal = loss(params)
    np.testing.assert_allclose(float(got_primal), float(ref), rtol=5e-4)
    for path, g_ref in jax.tree_util.tree_flatten_with_path(ref_grad)[0]:
        g_got = got_grad
        for k in path:
            g_got = g_got[k.key]
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=1e-5, rtol=1e-3,
            err_msg=f"grad diverges at {jax.tree_util.keystr(path)}",
        )


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import EsmConfig as HFEsmConfig, EsmModel

    torch.manual_seed(0)
    hf_cfg = HFEsmConfig(
        vocab_size=33, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1, mask_token_id=32,
    )
    hf = EsmModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=64, num_layers=2,
                    num_heads=4, max_len=128, token_dropout=True,
                    layer_norm_eps=1e-12)  # HF EsmConfig default
    params = convert_esm_torch_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_parity_with_hf_esm(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_pair

    seqs = [protein.random_protein(rng, 20), protein.random_protein(rng, 13)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)

    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    out = tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask), pooling="tokens"
    )
    out = np.asarray(out)
    # compare valid positions only
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :n], out_hf[b, :n], atol=1e-5, rtol=1e-4,
            err_msg=f"sequence {b} token embeddings diverge from HF ESM",
        )


def test_parity_mean_residue_pooling(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_pair
    seqs = [protein.random_protein(rng, 17)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)
    with torch.no_grad():
        h = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    n = int(mask[0].sum())
    expected = h[0, 1 : n - 1].mean(axis=0)  # excl BOS/EOS (tf nb cell 21)

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    got = tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    np.testing.assert_allclose(np.asarray(got)[0], expected, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_esm_mask_invariance(hf_pair, rng):
    """Padding must not leak into real positions."""
    _, cfg, params = hf_pair
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks, mask = protein.tokenize_batch([protein.random_protein(rng, 10)], pad_multiple=16)
    out1 = tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask),
                       pooling="mean_residues")
    toks2 = toks.copy()
    toks2[0, mask[0].sum():] = 7  # garbage token ids in padded region
    out2 = tower.apply({"params": params}, jnp.asarray(toks2), jnp.asarray(mask),
                       pooling="mean_residues")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_esm_config_family():
    cfg = esm_config_from_name("esm2_t33_650M")
    assert cfg.d_model == 1280 and cfg.num_layers == 33 and cfg.num_heads == 20
    cfg8 = esm_config_from_name("esm2_t6_8M")
    assert cfg8.d_model == 320 and cfg8.num_layers == 6


@pytest.mark.slow
def test_bf16_tower_close_to_fp32(hf_pair, rng):
    """The bf16 compute policy (production path) stays within bf16 tolerance
    of the fp32 tower — the 'bf16 numerics' parity gate of SURVEY.md sec 7."""
    _, cfg, params = hf_pair
    toks, mask = protein.tokenize_batch([protein.random_protein(rng, 25)])
    f32 = ESMTower(cfg=cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    bf16 = ESMTower(cfg=cfg, dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    a = np.asarray(bf16, np.float32)[0]
    b = np.asarray(f32)[0]
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos  # direction preserved (what retrieval uses)
    # per-component error small relative to the embedding norm
    assert np.abs(a - b).max() / np.linalg.norm(b) < 0.02


def test_export_roundtrips_converter(hf_pair):
    """export_esm_torch_params is the exact inverse of
    convert_esm_torch_params (HF sd -> flax -> HF sd is bit-identical for
    every key the tower owns), and the exported sd loads into a fresh HF
    EsmModel reproducing the flax forward — publish-back parity."""
    torch = pytest.importorskip("torch")
    from transformers import EsmModel

    from clip_dplm_tpu.models.esm import export_esm_torch_params

    hf, cfg, params = hf_pair
    sd = export_esm_torch_params(params, cfg)
    ref = {k: np.asarray(v.detach().numpy(), np.float32)
           for k, v in hf.state_dict().items()}
    for k, v in sd.items():
        np.testing.assert_array_equal(v, ref[k], err_msg=k)

    hf2 = EsmModel(hf.config, add_pooling_layer=False)
    missing, unexpected = hf2.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected
    # only non-owned keys (rotary inv_freq buffers etc.) may be missing
    assert all("inv_freq" in k or "contact_head" in k or "position_emb" in k
               for k in missing), missing


def test_export_rejects_unmerged_lora(hf_pair, rng):
    from clip_dplm_tpu.models.esm import export_esm_torch_params
    from clip_dplm_tpu.models.lora import merge_lora, spec_from

    _, cfg, _ = hf_pair
    lcfg = ESMConfig(**{**cfg.__dict__, "lora_rank": 2})
    tower = ESMTower(cfg=lcfg, dtype=jnp.float32)
    toks, mask = protein.tokenize_batch([protein.random_protein(rng, 12)])
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(toks))["params"]
    with pytest.raises(ValueError, match="merge_lora"):
        export_esm_torch_params(params, lcfg)
    merged = merge_lora(params, spec_from(lcfg))
    sd = export_esm_torch_params(merged, lcfg)
    assert "encoder.layer.0.attention.self.query.weight" in sd


def test_esm_scan_layers_matches_unrolled(rng):
    """esm.scan_layers: the scanned trunk computes the unrolled tower's
    function on stacked params (stack_esm_layers conversion)."""
    from clip_dplm_tpu.models.esm import stack_esm_layers

    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=64, num_layers=3,
                    num_heads=4, max_len=64)
    cfg_s = ESMConfig(**{**cfg.__dict__, "scan_layers": True})
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    tower_s = ESMTower(cfg=cfg_s, dtype=jnp.float32)
    seqs = [protein.random_protein(rng, 20), protein.random_protein(rng, 13)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    p = tower.init(jax.random.PRNGKey(0), toks)["params"]
    ps = stack_esm_layers(p, cfg.num_layers)
    init_s = tower_s.init(jax.random.PRNGKey(0), toks)["params"]
    assert jax.tree_util.tree_structure(init_s) == \
        jax.tree_util.tree_structure(ps)
    a = tower.apply({"params": p}, toks, mask, pooling="mean_residues")
    b = tower_s.apply({"params": ps}, toks, mask, pooling="mean_residues")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_unstack_inverts_stack_and_export_handles_scanned_trees(rng):
    """unstack_esm_layers is the exact inverse of stack_esm_layers, and
    export_esm_torch_params transparently unstacks a scan_layers tree (the
    layout recommended for the big trunks the publish-back path targets)."""
    from clip_dplm_tpu.models.esm import (
        export_esm_torch_params, stack_esm_layers, unstack_esm_layers)

    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=64, num_layers=3,
                    num_heads=4, max_len=64)
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks, _ = protein.tokenize_batch([protein.random_protein(rng, 12)],
                                     pad_multiple=8)
    p = tower.init(jax.random.PRNGKey(0), jnp.asarray(toks))["params"]

    rt = unstack_esm_layers(stack_esm_layers(p, cfg.num_layers), cfg.num_layers)
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(p)
    for a, b in zip(jax.tree_util.tree_leaves(rt), jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sd_unrolled = export_esm_torch_params(p, cfg)
    sd_scanned = export_esm_torch_params(stack_esm_layers(p, cfg.num_layers), cfg)
    assert sd_unrolled.keys() == sd_scanned.keys()
    for k in sd_unrolled:
        np.testing.assert_array_equal(sd_unrolled[k], sd_scanned[k], err_msg=k)
