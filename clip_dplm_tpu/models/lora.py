"""LoRA adapters for the ESM-family trunks (ESMTower, DPLM).

Low-rank fine-tuning for the large frozen towers the reference loads
(ESM-2 650M: tf nb cell 21; ProtT5-XL: old/encoders.py:15-31). The
reference freezes those towers outright; LoRA is the standard way to
fine-tune at that scale without paying full optimizer state, and it is a
TPU-friendly formulation:

  * the adapter path is the classic two-matmul form
    ``y += (alpha/r) * (x @ A) @ B`` — at r << d the backward contracts
    ``dA = x^T (dy B^T)`` and never forms the (d_in, d_out) dW, so the
    frozen sites' heavyweight dW matmuls disappear from the step
    (``stop_gradient`` on the base kernels lets XLA DCE them);
  * adapters compose with every existing compute path unchanged — the
    packed-qkv Pallas attention (deltas are added into the packed qkv
    slices; the ``out`` site merges into the kernel's weight operand),
    fused dense blocks, GPipe layer stacking, and TP sharding (a/b are
    small and replicate under the shape-based tp_leaf_spec);
  * optimizer moments are allocated ONLY for trainable leaves
    (``optax.masked`` in train/state.py::freeze_subtrees) — at 650M the
    frozen base contributes zero bytes of Adam state.

Param layout: each adapted dense site ``<name>`` gains a sibling module
``<name>_lora`` holding ``a (in, r)`` and ``b (r, out)``; ``b`` is
zero-initialized so a LoRA model is exactly the base model at init. The
base param tree is byte-identical to the non-LoRA one, so pretrained
checkpoints and the HF converters load unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_SITES = ("q", "k", "v", "out", "ffn_in", "ffn_out")


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Hashable adapter spec (safe as a flax module attribute / jit closure)."""

    rank: int = 8
    alpha: float = 16.0
    targets: Tuple[str, ...] = ("q", "v")
    # stop_gradient the base kernels at use: XLA drops their dW matmuls.
    # Freezing itself is enforced by the masked optimizer either way.
    freeze_base: bool = True

    def __post_init__(self):
        bad = set(self.targets) - set(_SITES)
        if bad:
            raise ValueError(f"unknown LoRA targets {sorted(bad)}; "
                             f"valid: {_SITES}")
        if self.rank <= 0:
            raise ValueError("LoRA rank must be positive")

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def spec_from(cfg) -> Optional[LoRASpec]:
    """Build a LoRASpec from any config carrying lora_rank/alpha/targets
    (ESMConfig, DPLMConfig). Returns None when rank == 0 (disabled)."""
    rank = getattr(cfg, "lora_rank", 0)
    if not rank:
        return None
    return LoRASpec(
        rank=rank,
        alpha=getattr(cfg, "lora_alpha", 16.0),
        targets=tuple(getattr(cfg, "lora_targets", ("q", "v"))),
    )


class LoRAPair(nn.Module):
    """The (a, b) low-rank pair for one dense site.

    ``__call__(x)`` returns the activation-space delta ``scale * (x@a)@b``;
    ``__call__(weight_only=True)`` returns the weight-space delta
    ``scale * a@b`` (used where the base weight feeds a fused kernel and
    the pre-projection activation never leaves VMEM — the packed path's
    ``out`` site)."""

    in_features: int
    features: int
    rank: int
    alpha: float
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 weight_only: bool = False) -> jax.Array:
        a = self.param("a", nn.initializers.he_uniform(),
                       (self.in_features, self.rank), self.param_dtype)
        b = self.param("b", nn.initializers.zeros_init(),
                       (self.rank, self.features), self.param_dtype)
        scale = self.alpha / self.rank
        if weight_only:
            return (a @ b) * scale
        if x is None:
            raise ValueError("x is required unless weight_only=True")
        y = (x.astype(self.dtype) @ a.astype(self.dtype)) @ b.astype(self.dtype)
        return y * jnp.asarray(scale, self.dtype)


def is_lora_path(path: Tuple[str, ...]) -> bool:
    """True if a flax param path belongs to an adapter (any `<site>_lora`
    module segment)."""
    return any(seg.endswith("_lora") for seg in path)


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def has_lora_params(params) -> bool:
    return any(is_lora_path(p) for p, _ in _walk(params))


def split_lora(params):
    """Split a param tree into (base, adapters), each with the original
    nesting. `adapters` holds only `*_lora` subtrees — the thing to save as
    a small adapter checkpoint; `base` is loadable by the non-LoRA model."""

    def rec(tree):
        base, ada = {}, {}
        for k, v in tree.items():
            if k.endswith("_lora"):
                ada[k] = v
            elif isinstance(v, dict):
                b, a = rec(v)
                if b:
                    base[k] = b
                if a:
                    ada[k] = a
            else:
                base[k] = v
        return base, ada

    return rec(params)


def merge_adapters(base, adapters):
    """Inverse of split_lora: graft adapter subtrees back into a base tree
    (e.g. after loading a small adapter checkpoint over pretrained weights)."""

    def rec(b, a):
        out = dict(b)
        for k, v in a.items():
            if k in out and isinstance(v, dict) and not k.endswith("_lora"):
                out[k] = rec(out[k], v)
            else:
                out[k] = v
        return out

    return rec(base, adapters)


def save_adapters_npz(path: str, params) -> int:
    """Save ONLY the adapter leaves to an .npz (keys are /-joined paths) —
    the small artifact to ship instead of a full checkpoint. Returns the
    number of leaves saved."""
    import numpy as np

    _, ada = split_lora(params)
    flat = {"/".join(p): np.asarray(v) for p, v in _walk(ada)}
    if not flat:
        raise ValueError("no *_lora adapters in this param tree")
    np.savez(path, **flat)
    return len(flat)


def load_adapters_npz(path: str):
    """Inverse of save_adapters_npz: .npz -> nested adapter tree, ready for
    merge_adapters(base_params, adapters)."""
    import numpy as np

    with np.load(path) as flat:
        tree: dict = {}
        for k in flat.files:
            node = tree
            parts = k.split("/")
            for s in parts[:-1]:
                node = node.setdefault(s, {})
            node[parts[-1]] = jnp.asarray(flat[k])
    return tree


def merge_lora(params, spec: LoRASpec):
    """Fold every adapter into its sibling base kernel:
    ``kernel += scale * a @ b``, dropping the `*_lora` nodes. The result is
    a plain param tree for the non-LoRA model whose forward matches the
    adapted model exactly (test_lora::test_merge_matches_adapted_forward) —
    the deploy/export form."""

    def rec(tree):
        out = {}
        lora_here = {k: v for k, v in tree.items() if k.endswith("_lora")}
        for k, v in tree.items():
            if k.endswith("_lora"):
                continue
            if isinstance(v, dict):
                lk = f"{k}_lora"
                if lk in lora_here:
                    pair = lora_here[lk]
                    delta = (pair["a"] @ pair["b"]) * spec.scale
                    v = dict(v)
                    v["kernel"] = v["kernel"] + delta.astype(v["kernel"].dtype)
                    out[k] = v
                else:
                    out[k] = rec(v)
            else:
                out[k] = v
        # adapters whose base site is missing would be silently dropped —
        # that is a structural bug upstream, fail loudly instead
        orphans = [k for k in lora_here
                   if k[: -len("_lora")] not in tree]
        if orphans:
            raise ValueError(f"LoRA adapters without base site: {orphans}")
        return out

    return rec(params)
