"""Unified pytree config for the whole framework.

One dataclass tree + YAML round-trip + dotted CLI overrides, superseding the
reference's four config mechanisms (HF ``PretrainedConfig`` composition in
``run1/configuration_hybrid_clip.py:93-218``, the dataclass tree of
``triple_flow/1_config.py:286-383``, the raw YAML dict of
``tong/configs/default.yaml`` and per-script argparse).

Configs are frozen dataclasses so they can be closed over by jitted functions
(hashable static arguments) without retracing hazards.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


# ---------------------------------------------------------------------------
# leaf configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TowerConfig:
    """One encoder tower over a precomputed embedding vector.

    Mirrors ``ModelArchitectureConfig`` (run1/configuration_hybrid_clip.py:68-79)
    and the MLP tower of old/clip.py:8-17.
    """

    input_dim: int = 158
    hidden_size: int = 512
    num_hidden_layers: int = 3
    num_attention_heads: int = 8
    architecture: str = "mlp"  # mlp | transformer | resnet
    activation: str = "relu"
    dropout: float = 0.1
    # route the final Dense+LayerNorm through the fused Pallas block kernel
    # (ops/fused_dense.py) — TPU-only; silently unfused elsewhere
    fused_dense: bool = False


@dataclass(frozen=True)
class ProjectionConfig:
    """Projection head into the shared space.

    ``kind='base'`` follows old/clip.py:20-36 (Linear-LN-GELU-Dropout-Linear-LN);
    ``kind='optimized'`` follows old/clip_opt.py:9-44 (skip path + learnable
    layer-scale init 1e-4, hidden = 4x projection dim).
    """

    kind: str = "optimized"  # linear | base | optimized
    dim: int = 512
    hidden_dim: Optional[int] = None  # default: 2x input (base) / 4x dim (optimized)
    # "gelu" is the flax/jax.nn default (tanh approximation; what the fused
    # Pallas blocks implement); "gelu_exact" is erf-GELU, bit-matching
    # torch.nn.GELU() for reference-parity A/Bs (forces the unfused path).
    act: str = "gelu"  # gelu | gelu_exact | relu
    dropout: float = 0.1
    layer_scale_init: float = 1e-4
    # route Dense+LN+GELU+Dropout blocks through the fused Pallas block
    # kernel with in-kernel dropout PRNG (ops/fused_dense.py) — TPU-only
    fused_dense: bool = False
    # emit L2-normalized embeddings from the projection head (folded into
    # the fused kernel epilogue; the loss then skips its own normalize).
    # Trade-off: analysis mean_norm collapse diagnostics read 1.0.
    l2_normalize_output: bool = False


@dataclass(frozen=True)
class ContrastiveConfig:
    """InfoNCE / CLIP loss knobs (old/clip_opt.py:46-151, tong/utils/losses.py:4-19)."""

    loss_kind: str = "infonce"  # infonce | flatnce | siglip | supcon
    logit_scale_init: float = 2.6592  # == log(1/0.07)
    logit_scale_max: float = 100.0  # clamp of exp(logit_scale)
    learned_temperature: bool = True
    temperature: float = 0.07  # used when not learned
    label_smoothing: float = 0.0  # reference computed 0.1 but used hard labels
    cache_size: int = 8192  # hard-negative embedding cache
    use_cache: bool = False
    gather_global_batch: bool = True  # all-gather embeddings over the mesh
    use_fused_kernel: bool = False  # Pallas fused InfoNCE (ops/fused_infonce.py)
    # materialize the raw similarity (int16 fixed-point) in the fused forward
    # so the backward skips its recompute matmuls: "auto" | "always" | "never"
    fused_materialize_raw: str = "auto"


@dataclass(frozen=True)
class TransformerTowerConfig:
    """Token-level transformer tower (rna_clip_codes.ipynb cell 28 semantics).

    3x encoder layers, 8 heads, 4x FFN, CLS-position pooling over padded
    variable-length token embeddings.
    """

    input_dim: int = 120
    d_model: int = 512
    num_layers: int = 3
    num_heads: int = 8
    ffn_mult: int = 4
    dropout: float = 0.1
    max_len: int = 512
    pooling: str = "cls"  # cls | mean
    # LayerNorm output dtype inside the blocks. flax computes the stats in
    # f32 either way; "bfloat16" skips the f32 materialization of the LN
    # output that the following cast would round to bf16 anyway (measured
    # ~1.4 ms per LN at B=1024, S=128, d=512 on v5e)
    ln_dtype: str = "float32"  # float32 | bfloat16


@dataclass(frozen=True)
class ESMConfig:
    """ESM-style protein transformer (tf nb cell 21; triple_flow/3_esm_integration.py:45-135).

    Sizes follow the public ESM-2 family so torch checkpoints convert 1:1.
    """

    name: str = "esm2_t6_8M"
    vocab_size: int = 33
    d_model: int = 320
    num_layers: int = 6
    num_heads: int = 20
    max_len: int = 1024
    token_dropout: bool = True
    layer_norm_eps: float = 1e-5  # facebook/esm2 checkpoints use 1e-5
    frozen: bool = True
    # LoRA fine-tuning (models/lora.py): rank 0 disables. With rank > 0 the
    # base tower is frozen per-weight (stop_gradient + masked optimizer —
    # no Adam moments allocated for the base) and only the `<site>_lora`
    # adapters train; targets ⊆ {q, k, v, out, ffn_in, ffn_out}.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: Tuple[str, ...] = ("q", "v")
    # lax.scan over the block stack (stacked params, one compiled block) —
    # the compile-time answer for 650M+ trunks; see DPLMConfig.scan_layers.
    # models/esm.py::stack_esm_layers converts converted/unrolled trees.
    scan_layers: bool = False


@dataclass(frozen=True)
class ProtT5Config:
    """ProtT5 encoder (T5 v1.0 stack; old/encoders.py:15-31 loads
    Rostlab/prot_t5_xl_half_uniref50-enc). Defaults are the xl (t5-3b
    encoder-half) geometry; see models/t5.py::prot_t5_config_from_name."""

    name: str = "prot_t5_xl"
    vocab_size: int = 128
    d_model: int = 1024
    d_ff: int = 16384
    num_layers: int = 24
    num_heads: int = 32
    d_kv: int = 128
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    frozen: bool = True


@dataclass(frozen=True)
class RNABertConfig:
    """RNABERT-compatible RNA base encoder (old/encoders.py:53-74 shelled out
    to the external repo for these 120-dim embeddings; rna nb cell 28 consumes
    them as input_dim=120). Defaults are the published RNABERT geometry."""

    name: str = "rnabert"
    vocab_size: int = 9
    d_model: int = 120
    num_layers: int = 6
    num_heads: int = 12
    d_ff: int = 40
    max_len: int = 440
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    frozen: bool = True


@dataclass(frozen=True)
class GNNConfig:
    """PiGNN over the cell kNN graph (tong/models/layers/gnn.py:6-128)."""

    hidden_dim: int = 512
    num_layers: int = 3
    num_heads: int = 8
    edge_dim: int = 16
    dropout: float = 0.1
    n_neighbors: int = 32


@dataclass(frozen=True)
class EncoderConfig:
    """The tong three-encoder stack (tong/models/encoders/, tong/configs/default.yaml)."""

    latent_dim: int = 512
    gene_dim: int = 2000
    use_time_encoding: bool = True
    time_embed_dim: int = 128
    n_perturb_genes: int = 10
    esm_dim: int = 1280
    use_cross_attention: bool = True
    protein_hidden_dims: Tuple[int, ...] = (1024, 768)
    dropout: float = 0.1
    gnn: GNNConfig = field(default_factory=GNNConfig)


@dataclass(frozen=True)
class FlowConfig:
    """OT-CFM flows (tong/models/flows/ot_flow.py, tong/configs/default.yaml:34-46)."""

    flow_type: str = "exact_ot"  # exact_ot | sb | independent
    sigma: float = 0.1
    latent_dim: int = 512
    hidden_dim: int = 1024
    n_layers: int = 3
    dropout: float = 0.1
    use_time_embedding: bool = True
    time_embed_dim: int = 128
    use_path_length_reg: bool = True
    use_jacobian_reg: bool = False
    use_feature_mixing: bool = False
    sinkhorn_iters: int = 100
    sinkhorn_epsilon: float = 0.02  # == 2*sigma^2 for sb default


@dataclass(frozen=True)
class ICNNConfig:
    """Input-convex net / Brenier potential (triple_flow/1_config.py:99-122,
    triple_flow/2_icnn_core.py:42-241)."""

    input_dim: int = 512
    hidden_dims: Tuple[int, ...] = (512, 256, 128)
    activation: str = "softplus"  # softplus | celu
    use_layer_norm: bool = True
    # enforce positivity on the final layer + layer scales so Psi is convex
    # by construction (the reference's stated requirement at
    # 2_icnn_core.py:8-13, which its unconstrained nn.Linear final violates)
    strict_convex: bool = True
    init_scale: float = 0.1
    eps: float = 1e-6
    gradient_clip: float = 10.0
    hessian_reg: float = 1e-4
    w2_weight: float = 1.0
    sparsity_weight: float = 0.01
    consistency_weight: float = 0.1


@dataclass(frozen=True)
class DPLMConfig:
    """Discrete-diffusion protein LM sampler (new-build; named by the repo +
    BASELINE.json config 5 -- no implementation exists in the reference)."""

    vocab_size: int = 33
    d_model: int = 640
    num_layers: int = 12
    num_heads: int = 10
    max_len: int = 512
    num_diffusion_steps: int = 100
    layer_norm_eps: float = 1e-5  # matches ESM-2 checkpoints for warm-start
    guidance_scale: float = 1.0
    guidance: str = "rerank"  # none | rerank | gradient
    num_candidates: int = 8  # for rerank guidance
    # LoRA fine-tuning of the trunk (models/lora.py; e.g. specializing a
    # warm-started 650M DPLM to a protein family): rank 0 disables
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: Tuple[str, ...] = ("q", "v")
    # lax.scan over the layer stack (params stacked on axis 0): compiles ONE
    # block instead of num_layers copies — at 650M-scale (33 layers) the
    # unrolled trunk is minutes of XLA time per jit. Param tree changes from
    # layer_<i>/... to layers/...(stacked); models/dplm.py::stack_dplm_layers
    # converts. Off by default: unrolled layers let XLA fuse across block
    # boundaries (the ffn_out+next-LN fusion is worth a few % at d=640).
    scan_layers: bool = False


@dataclass(frozen=True)
class LossWeights:
    """tong/configs/default.yaml:48-52."""

    contrastive: float = 1.0
    flow: float = 1.0
    regularization: float = 0.1


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + warmup-cosine (run1 TrainingConfig:81-91; triple_flow OptimConfig:125-150)."""

    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    warmup_steps: int = 1000
    total_steps: int = 100_000
    schedule: str = "warmup_cosine"  # warmup_cosine | cosine | constant
    min_lr_ratio: float = 0.0
    grad_clip_norm: float = 1.0
    grad_accum_steps: int = 1  # real (lax.scan microbatches), unlike the ref
    # dtype of Adam's moments under fused_update (bfloat16 halves optimizer
    # HBM traffic; measured -0.5 ms/step at 20M params on v5e)
    moment_dtype: str = "float32"
    # single-pass AdamW with the global-norm clip folded in (train/state.py);
    # false falls back to optax.chain(clip_by_global_norm, adamw)
    fused_update: bool = True
    # "exact": clip with this step's global norm (torch semantics);
    # "stale": clip with the previous step's norm — removes the all-gradients
    # reduction barrier before the optimizer kernels (~0.4 ms at 20M on v5e)
    clip_mode: str = "exact"


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 128  # global batch
    num_epochs: int = 100
    eval_every_steps: int = 100
    log_every_steps: int = 10
    checkpoint_every_steps: int = 1000
    keep_checkpoints: int = 3
    # overlap checkpoint serialization/IO with training (Orbax background
    # threads); the trainer barriers before reads and at the end of training
    async_checkpoint: bool = True
    # catch SIGTERM (spot/maintenance preemption notice) and checkpoint the
    # live state at STEP granularity before exiting (train/preemption.py)
    preemption_checkpoint: bool = True
    # multi-host only: poll the cross-host flag agreement (a collective)
    # every N host-loop batches instead of every batch — the allgather syncs
    # host and device, killing the host's dispatch run-ahead if done per
    # step. Preemption notices give tens of seconds; N batches of slack is
    # safe. Single-process polling is a plain flag read every batch.
    preemption_poll_batches: int = 8
    early_stopping_patience: int = 10
    seed: int = 42
    # scan this many train steps per jit call (the host stacks that many
    # batches); amortizes per-call dispatch latency on remote/tunneled TPUs
    steps_per_call: int = 1
    # log the global gradient norm as a metric (costs an extra full pass
    # over the gradients, ~4% of a B=8k step; clipping is unaffected)
    log_grad_norm: bool = False
    # dropout PRNG implementation: threefry (default, strongest) or
    # unsafe_rbg (hardware RNG path - measured 1.3x step speedup at B=8k on
    # v5e because threefry bit generation for big dropout masks is slow)
    rng_impl: str = "threefry2x32"
    loss_weights: LossWeights = field(default_factory=LossWeights)
    optim: OptimConfig = field(default_factory=OptimConfig)


@dataclass(frozen=True)
class PrecisionConfig:
    """bf16 compute policy with fp32 islands (replaces CUDA AMP / GradScaler;
    see SURVEY.md section 2.6: logit scale, loss, ICNN gradient stay fp32)."""

    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    remat: bool = False  # jax.checkpoint on tower blocks


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh (replaces NCCL process group of run1/full.py:283,374).

    data: batch sharding (DP + the global-batch all-gather of old/clip_opt.py:102-112)
    model: reserved tensor-parallel axis for large towers.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1  # mesh size along the model axis


@dataclass(frozen=True)
class AugmentConfig:
    """tong/configs/default.yaml:67-70 + run1/full.py GaussianNoise."""

    gene_dropout: float = 0.1
    edge_dropout: float = 0.15
    perturbation_noise: float = 0.05
    gaussian_noise: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    path: str = ""
    dataset: str = "synthetic"  # synthetic | embeddings | anndata | rna_rbp
    num_workers: int = 0
    n_top_genes: int = 2000
    max_seq_len: int = 1024
    augment: AugmentConfig = field(default_factory=AugmentConfig)


@dataclass(frozen=True)
class LoggingConfig:
    log_dir: str = "runs"
    use_wandb: bool = False  # gated; wandb not installed in this image
    csv_metrics: bool = True
    profile: bool = False
    profile_dir: str = "runs/profile"


@dataclass(frozen=True)
class Config:
    """Master config (analog of TripleFlowConfig, triple_flow/1_config.py:286-383)."""

    experiment: str = "two_tower"
    # towers for two-tower CLIP over precomputed embeddings
    tower_a: TowerConfig = field(default_factory=TowerConfig)
    tower_b: TowerConfig = field(default_factory=lambda: TowerConfig(input_dim=1280))
    projection: ProjectionConfig = field(default_factory=ProjectionConfig)
    contrastive: ContrastiveConfig = field(default_factory=ContrastiveConfig)
    # token-level towers
    rna_tower: TransformerTowerConfig = field(default_factory=TransformerTowerConfig)
    rbp_tower: TransformerTowerConfig = field(
        default_factory=lambda: TransformerTowerConfig(input_dim=1280)
    )
    esm: ESMConfig = field(default_factory=ESMConfig)
    encoders: EncoderConfig = field(default_factory=EncoderConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    icnn: ICNNConfig = field(default_factory=ICNNConfig)
    dplm: DPLMConfig = field(default_factory=DPLMConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)


# ---------------------------------------------------------------------------
# (de)serialization + overrides
# ---------------------------------------------------------------------------


def to_dict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce YAML/CLI values into the declared field type."""
    origin = getattr(typ, "__origin__", None)
    if origin is tuple or typ is tuple:
        return tuple(value)
    if typ is float and isinstance(value, (int, str)):
        return float(value)
    if typ is int and isinstance(value, str):
        return int(value)
    if typ is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    return value


def from_dict(cls: type, d: Dict[str, Any]) -> Any:
    kwargs: Dict[str, Any] = {}
    field_map = {f.name: f for f in fields(cls)}
    for key, value in d.items():
        if key not in field_map:
            raise KeyError(f"unknown config key {cls.__name__}.{key}")
        f = field_map[key]
        if is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _DATACLASS_REGISTRY
        ):
            sub = _resolve_type(f.type)
            kwargs[key] = from_dict(sub, value) if isinstance(value, dict) else value
        else:
            sub = _resolve_type(f.type) if isinstance(f.type, str) else f.type
            if is_dataclass(sub) and isinstance(value, dict):
                kwargs[key] = from_dict(sub, value)
            else:
                kwargs[key] = _coerce(value, sub)
    return cls(**kwargs)


_DATACLASS_REGISTRY = {
    c.__name__: c
    for c in (
        TowerConfig, ProjectionConfig, ContrastiveConfig, TransformerTowerConfig,
        ESMConfig, GNNConfig, EncoderConfig, FlowConfig, ICNNConfig, DPLMConfig,
        LossWeights, OptimConfig, TrainConfig, PrecisionConfig, MeshConfig,
        AugmentConfig, DataConfig, LoggingConfig, Config,
    )
}


def _resolve_type(typ: Any) -> Any:
    if isinstance(typ, str):
        # `from __future__ import annotations` stringifies annotations; resolve
        # dataclass names and common builtins.
        if typ in _DATACLASS_REGISTRY:
            return _DATACLASS_REGISTRY[typ]
        builtin = {"int": int, "float": float, "str": str, "bool": bool}.get(typ)
        if builtin is not None:
            return builtin
        if typ.startswith("Tuple"):
            return tuple
        if typ.startswith("Optional[int]"):
            return int
        if typ.startswith("Optional[float]"):
            return float
        return str
    return typ


def replace_path(cfg: Any, dotted: str, value: Any) -> Any:
    """Return a copy of `cfg` with the dotted path replaced, e.g.
    replace_path(cfg, "train.optim.learning_rate", 1e-4)."""
    head, _, rest = dotted.partition(".")
    if not rest:
        f = {f.name: f for f in fields(cfg)}[head]
        typ = _resolve_type(f.type)
        if isinstance(value, str) and not is_dataclass(typ):
            if typ is tuple:
                value = tuple(json.loads(value))
            else:
                value = _coerce(value, typ)
        elif typ is tuple and isinstance(value, list):
            value = tuple(value)
        elif typ is float:
            value = float(value)
        return dataclasses.replace(cfg, **{head: value})
    sub = getattr(cfg, head)
    return dataclasses.replace(cfg, **{head: replace_path(sub, rest, value)})


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply CLI overrides of the form `a.b.c=value`."""
    for item in overrides:
        key, _, value = item.partition("=")
        cfg = replace_path(cfg, key.strip(), value.strip())
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def load_config(
    path: Optional[str] = None, overrides: Sequence[str] = ()
) -> Config:
    """Load a Config from YAML (or defaults) and apply dotted overrides."""
    cfg = Config()
    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        cfg = from_dict(Config, raw)
    return apply_overrides(cfg, overrides)


def create_experiment_configs(base: Config, sweep: str) -> List[Tuple[str, Config]]:
    """Spawn sweep variants (run1/configuration_hybrid_clip.py:195-218 semantics:
    embedding_sweep / architecture_search / training_sweep), plus the
    batch/dim/temperature sweeps of run1/full.py:199-214."""
    out: List[Tuple[str, Config]] = []
    if sweep == "embedding_sweep":
        for dim in (32, 64, 128, 256, 512):
            out.append((f"proj_dim_{dim}", replace_path(base, "projection.dim", dim)))
    elif sweep == "architecture_search":
        for arch, layers in (("mlp", 3), ("transformer", 3), ("transformer", 6), ("resnet", 3)):
            cfg = replace_path(base, "tower_a.architecture", arch)
            cfg = replace_path(cfg, "tower_a.num_hidden_layers", layers)
            cfg = replace_path(cfg, "tower_b.architecture", arch)
            cfg = replace_path(cfg, "tower_b.num_hidden_layers", layers)
            out.append((f"arch_{arch}_{layers}", cfg))
    elif sweep == "training_sweep":
        for bs in (32, 64, 128, 256):
            out.append((f"batch_{bs}", replace_path(base, "train.batch_size", bs)))
        for lr in (1e-4, 3e-4, 1e-3):
            out.append((f"lr_{lr}", replace_path(base, "train.optim.learning_rate", lr)))
    elif sweep == "temperature_sweep":
        for t in (0.05, 0.07, 0.1, 0.2):
            cfg = replace_path(base, "contrastive.temperature", t)
            cfg = replace_path(cfg, "contrastive.learned_temperature", False)
            out.append((f"temp_{t}", cfg))
    else:
        raise ValueError(f"unknown sweep {sweep!r}")
    return out
