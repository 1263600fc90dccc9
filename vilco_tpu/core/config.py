"""Typed configuration system.

One config schema replaces the reference's three styles (MQ/NLQ DEFAULTS-dict +
recursive YAML merge at MQ/libs/core/config.py:4-204, VQ global easydict at
VQ/config/config.py). Frozen dataclasses keep model configs hashable so they
can be static arguments to `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from typing import Any, Mapping, Optional, Tuple

import yaml


def _freeze(v):
    """Recursively convert lists to tuples so configs stay hashable."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, tuple):
        return tuple(_freeze(x) for x in v)
    return v


class _Base:
    """Mixin: dict-merge construction and replace()."""

    @classmethod
    def from_dict(cls, d: Optional[Mapping[str, Any]]):
        d = dict(d or {})
        kwargs = {}
        for f in fields(cls):  # type: ignore[arg-type]
            if f.name not in d:
                continue
            v = d.pop(f.name)
            sub = _SUBCONFIG_TYPES.get((cls, f.name))
            if sub is not None and isinstance(v, Mapping):
                v = sub.from_dict(v)
            kwargs[f.name] = _freeze(v)
        if d:
            raise ValueError(f"Unknown {cls.__name__} keys: {sorted(d)}")
        return cls(**kwargs)  # type: ignore[call-arg]

    def updated(self, **kw):
        return replace(self, **{k: _freeze(v) for k, v in kw.items()})

    def to_dict(self):
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class DatasetConfig(_Base):
    """Mirrors reference `dataset` section (MQ/libs/core/config.py:14-41)."""

    name: str = "ego4d_mq"
    json_file: str = ""
    feat_folder: Tuple[str, ...] = ()
    file_prefix: str = ""
    file_ext: Tuple[str, ...] = (".pt",)
    feat_stride: float = 1.0
    num_frames: float = 1.0
    default_fps: Optional[float] = None
    input_dim: int = 4096
    num_classes: int = 110          # max classes over all CL tasks (static)
    downsample_rate: int = 1
    max_seq_len: int = 1024
    trunc_thresh: float = 0.3
    crop_ratio: Optional[Tuple[float, float]] = (0.9, 1.0)
    force_upsampling: bool = True
    use_text: bool = False
    text_feat_folder: str = ""
    use_narration: bool = False
    narration_feat_folder: str = ""
    narration_jsonl: str = ""
    max_text_len: int = 128
    max_narration_len: int = 128
    max_segments: int = 64          # static GT padding per clip
    # NLQ extras (NLQ/libs/core/config.py)
    train_jsonl_file: str = ""
    val_jsonl_file: str = ""
    video_feat_dir: str = ""
    text_feat_dir: str = ""
    val_text_feat_dir: str = ""
    input_txt_dim: int = 512
    enable_temporal_jittering: bool = False
    # MQ converts seconds->grid with a -0.5*num_frames centering offset
    # (ego4d.py:729-733); NLQ omits it (ego4d_loader.py:180-186)
    center_offset: bool = True


@dataclass(frozen=True)
class TrainCfg(_Base):
    """Mirrors reference `train_cfg` (MQ/libs/core/config.py:92-123)."""

    center_sample: str = "radius"
    center_sample_radius: float = 1.5
    # MQ weights cls/reg losses by learned per-class Gaussians
    # (meta_archs.py:1415-1471); NLQ does not (NLQ meta_archs.py:1094-1152)
    use_gaussian_weights: bool = True
    loss_weight: float = 1.0
    cls_prior_prob: float = 0.01
    init_loss_norm: float = 100.0
    clip_grad_l2norm: float = 1.0
    dropout: float = 0.0
    droppath: float = 0.1
    label_smoothing: float = 0.0
    t_c_alpha: float = 0.8
    al_loss_weight: float = 0.0
    temperature: float = 0.07


@dataclass(frozen=True)
class TestCfg(_Base):
    """Mirrors reference `test_cfg` (MQ/libs/core/config.py:124-139)."""

    pre_nms_thresh: float = 0.001
    pre_nms_topk: int = 2000
    iou_threshold: float = 0.1
    min_score: float = 0.001
    max_seg_num: int = 200
    nms_method: str = "soft"        # soft | hard | none
    nms_sigma: float = 0.75
    duration_thresh: float = 0.05
    multiclass_nms: bool = True
    voting_thresh: float = 0.75
    ext_score_file: str = ""


@dataclass(frozen=True)
class CLCfg(_Base):
    """Mirrors reference `cl_cfg` (MQ/libs/core/config.py:140-162)."""

    name: str = "naive"             # naive|ewc|mas|icarl|bic|l2p|vilco
    memory_size: int = 0
    pkl_file: str = ""
    random_order: bool = False
    reg_lambda: float = 0.0
    type_sampling: str = "icarl"
    path_memory: str = "path_memory.pkl"
    prompt_pool: bool = False
    pool_size: int = 10
    topk: int = 4
    length: int = 20
    embed_dim: int = 768
    narration_ssl: bool = False
    narration_dim: int = 512
    ssl_factor: float = 0.03
    use_adapt: bool = False
    adapt_blocks: Tuple[int, ...] = ()
    dist_factor: float = 0.01       # iCaRL/BiC distillation weight (meta_archs.py:1488,1509)
    num_tasks: int = 5
    classes_per_task: int = 22


@dataclass(frozen=True)
class ModelConfig(_Base):
    """Mirrors reference `model` section + derived fields.

    Reference: MQ/libs/core/config.py:45-91 plus `_update_config` (:189-197)
    which copies dataset dims into the model config.
    """

    name: str = "point_transformer"
    variant: str = "mq"            # mq (single tower + optional text) | nlq (dual tower)
    backbone_type: str = "convTransformer"
    fpn_type: str = "identity"
    backbone_arch: Tuple[int, ...] = (2, 2, 9)
    scale_factor: int = 2
    regression_range: Tuple[Tuple[float, float], ...] = (
        (0, 4), (2, 8), (4, 16), (8, 32), (16, 64), (32, 128),
        (64, 256), (128, 512), (256, 1024), (512, 10000),
    )
    n_head: int = 16
    n_mha_win_size: int = -1
    embd_kernel_size: int = 3
    embd_dim: int = 1024
    embd_with_ln: bool = True
    fpn_dim: int = 1024
    fpn_with_ln: bool = True
    fpn_start_level: int = 0
    head_dim: int = 1024
    head_kernel_size: int = 3
    head_num_layers: int = 3
    head_with_ln: bool = True
    max_buffer_len_factor: float = 1.0
    use_abs_pe: bool = True
    use_rel_pe: bool = False
    use_cross_modal: bool = False
    use_xl: bool = False
    xl_layers: int = 1
    # fused Pallas XL relative-attention kernel (kernels/xl_attention.py):
    # keeps the score chain in VMEM. Measured 104 -> 74.7 ms/step (+39%
    # throughput) at the flagship shape. TPU-only; resolved off on other
    # backends.
    fused_xl: bool = True
    # recompute the XL layer in backward instead of saving its (B,H,T,2T)
    # score tensors. Measured SLOWER on v5e (121 vs 104 ms/step at the
    # flagship shape): the recompute re-materializes the same HBM-resident
    # tensors and pays the matmuls again. Kept as a memory-pressure escape
    # hatch for longer sequences.
    remat_xl: bool = False
    xl_d_inner: int = 2048
    xl_mem_len: int = 256
    # the XL stage's dropout comes from the xlnet json, NOT train_cfg
    # (configs/xlnet_config_1024.json: dropout 0.1 at the flagship dims)
    xl_dropout: float = 0.1
    n_txt_in: int = 768
    # derived from dataset at load time
    input_dim: int = 4096
    num_classes: int = 110
    max_seq_len: int = 1024
    # copied from train_cfg by Config.derived() (reference passes train_cfg
    # into the backbone ctor, meta_archs.py:469-489)
    dropout: float = 0.0
    droppath: float = 0.1
    t_c_alpha: float = 0.8
    # numerics
    compute_dtype: str = "bfloat16"
    # Pallas fused attention kernels (opt-in; measured slower than XLA's
    # batched attention at the flagship shape — 41 vs 32 ms/step — because
    # D=64 contractions underfill the MXU when issued per-(batch, head);
    # auto-disabled off-TPU)
    # blocked fused full-attention Pallas kernel (kernels/attention.py):
    # measured 75.5 -> 68.3 ms/step on top of the fused XL kernel at the
    # MQ flagship shape. TPU-only (resolved off elsewhere); banded windows
    # stay on the XLA blocked form (see MaskedMHCA).
    fused_attention: bool = True
    # fused depthwise q/k/v conv preprocessing (kernels/dwconv.py): one
    # Pallas pass over x for all three MaskedMHCA convs, backward emits
    # dx + all three wgrads in one pass. Covers both the stride-1 stem
    # blocks and the stride-2 downsampling branch blocks (the latter via
    # fused_dwconv_qkv_s2, which also fuses the mask-downsample). TPU-only.
    fused_conv: bool = True
    # attention implementation for dense self-attention: "xla" (batched
    # matmuls), "flash" (jax's TPU flash-attention pallas kernel),
    # "pallas_naive" (kernels/attention.py). Resolved to "xla" off-TPU.
    attention_impl: str = "xla"
    # cross-modal levels: branch levels excluded from text cross-attention
    # (reference hardcodes [1, 2]; MQ/libs/modeling/backbones.py:280-283)
    cross_modal_skip_levels: Tuple[int, ...] = (1, 2)

    @property
    def num_branch_layers(self) -> int:
        """#strided pyramid layers. MQ arch is (convs, stem, branch); NLQ is
        (convs, txt_stem, vid_stem, cross_branch, plain_branch)
        (NLQ/libs/modeling/backbones.py:424-428)."""
        if len(self.backbone_arch) == 5:
            return self.backbone_arch[3] + self.backbone_arch[4]
        return self.backbone_arch[-1]

    @property
    def num_fpn_levels(self) -> int:
        return self.num_branch_layers + 1 - self.fpn_start_level

    @property
    def fpn_strides(self) -> Tuple[int, ...]:
        return tuple(
            self.scale_factor ** i
            for i in range(self.fpn_start_level, self.num_branch_layers + 1)
        )

    @property
    def max_div_factor(self) -> int:
        """Padding divisor so every pyramid level divides evenly.

        Reference: MQ/libs/modeling/meta_archs.py:405-416.
        """
        win = self.n_mha_win_size
        wins = [win] * (1 + self.num_branch_layers)
        mdf = 1
        for s, w in zip(self.fpn_strides, wins):
            stride = s * (w // 2) * 2 if w > 1 else s
            mdf = max(mdf, stride)
        return mdf


@dataclass(frozen=True)
class OptCfg(_Base):
    """Mirrors reference `opt` (MQ/libs/core/config.py:164-181)."""

    type: str = "adamw"
    momentum: float = 0.9
    weight_decay: float = 0.05
    learning_rate: float = 1e-4
    epochs: int = 10
    warmup: bool = True
    warmup_epochs: int = 5
    schedule_type: str = "cosine"
    schedule_steps: Tuple[int, ...] = ()
    schedule_gamma: float = 0.1
    eta_min: float = 1e-8
    # cap on the per-task epoch count; 0 means the reference default
    # max_epochs = epochs + warmup_epochs (MQ/train_cl.py:200-203 —
    # cfg['opt'].get('early_stop_epochs', epochs + warmup_epochs))
    early_stop_epochs: int = 0
    # per-task best-checkpoint selection: evaluate every epoch once
    # epoch >= total_epochs * eval_start_ratio (the reference's
    # max_epochs // 3 gate, MQ/train_cl.py:284) and ALWAYS restore the
    # first-best epoch before final validation (the reference reloads
    # best_task_XXX.pth.tar unconditionally, :363)
    track_best: bool = False
    eval_start_ratio: float = 1.0 / 3.0
    # metric the per-task best checkpoint is selected by — the MQ
    # reference uses the cumulative weighted avg mAP (total_mAP,
    # MQ/train_cl.py:295); the NLQ reference uses mean R@1
    # (NLQ/train_cl.py:250) — its yaml sets "avg_R1"
    best_metric: str = "avg_mAP"
    # Adam first-moment dtype. Default bfloat16: halves m-state HBM traffic
    # on the bandwidth-bound step (128.1 -> 129.4 clips/s at batch 16) and
    # is quality-neutral on the synthetic CL ladder (RESULTS.md round 2);
    # the second moment stays f32 for stability. Set "float32" for exact
    # reference AdamW state precision.
    mu_dtype: str = "bfloat16"
    # Adam second-moment storage dtype (honored by FusedAdamW; the update
    # is computed in f32 and the state cast on store). Default bfloat16
    # since round 3: halves nu-state HBM traffic on the bandwidth-bound
    # step (129.4 -> 130.6 clips/s) and is quality-neutral across a
    # 4-seed synthetic CL ladder (RESULTS.md round 3). Set "float32" for
    # exact reference AdamW state precision; non-fused optimizer paths
    # (factored / flatten / non-adamw) always keep f32.
    nu_dtype: str = "bfloat16"
    # "factored" swaps the full second moment for Adafactor-style row/col
    # statistics (optax.scale_by_factored_rms) — cuts optimizer-state HBM
    # traffic ~2x on the bandwidth-bound flagship step; opt-in because it
    # deviates from the reference's AdamW semantics
    second_moment: str = "full"
    # ravel the param pytree into one flat buffer for the update
    # (optax.flatten): ~500 per-tensor Adam updates (~800 tiny kernels per
    # step in the profile) collapse into a few big ones. Exact same math.
    flatten: bool = False
    # single-pass AdamW update (moments + decay + lr + apply in one
    # tree_map; no materialized updates pytree) — same math as the optax
    # chain, less HBM traffic. Ignored for sgd/factored/flatten.
    fused_apply: bool = True
    # "bfloat16" keeps a PERSISTENT bf16 copy of the big matmul/conv
    # kernels (the leaves the model consumes at bf16 anyway) for the
    # forward/backward, with the f32 master updated by AdamW — the
    # standard TPU mixed-precision trainer layout. Forward numerics are
    # bit-identical (the stored copy equals the per-step cast); gradients
    # land in bf16 (one extra rounding) before the f32 update math.
    # Cuts f32 weight reads + halves grad write/read traffic on the
    # bandwidth-bound step. OPT-IN (FusedAdamW path only) pending
    # quality validation per workload.
    param_compute_dtype: str = "float32"
    ema_decay: float = 0.0          # model EMA (train_utils.py ModelEma); 0 = off
    # gradient accumulation (reference `config.train.accumulation_step`,
    # VQ/config/config.py:75 + train_anchor.py:88-106): each optimizer
    # step consumes accumulation_steps micro-batches of loader.batch_size
    # via an in-step lax.scan — effective batch K*B at the device memory
    # of batch B (e.g. effective MQ batch 32 past the 16GB OOM at 32)
    accumulation_steps: int = 1

    @property
    def total_epochs(self) -> int:
        """Epochs actually trained per task: the reference's max_epochs =
        early_stop_epochs or epochs + warmup_epochs
        (MQ/train_cl.py:200-203; the schedule's cosine span is `epochs`
        with `warmup_epochs` of warmup prepended, so the loop runs through
        the full warmup + cosine)."""
        if self.early_stop_epochs > 0:
            return self.early_stop_epochs
        return self.epochs + (self.warmup_epochs if self.warmup else 0)


@dataclass(frozen=True)
class LoaderCfg(_Base):
    batch_size: int = 2
    num_workers: int = 0
    prefetch: int = 2


@dataclass(frozen=True)
class VQCfg(_Base):
    """VQ (visual-query 2-D localization) model/data knobs.

    Mirrors VQ/config/config.py:6-60 defaults as overridden by the shipped
    VQ/config/train_cl.yaml: DINOv2 ViT-B/14 backbone (frozen), 448-square
    30-frame clips, dim-256 matcher, 3 spatio-temporal transformer layers,
    anchors on a 16x16 grid.
    """

    dim: int = 256                      # matcher channel dim
    clip_size: int = 448                # dataset.clip_size_fine/coarse
    query_size: int = 448               # dataset.query_size
    patch_size: int = 14                # backbone_type 'vitb14'
    vit_dim: int = 768                  # ViT-B
    vit_depth: int = 12
    vit_heads: int = 12
    resolution_transformer: int = 8     # model.resolution_transformer
    resolution_anchor_feat: int = 16    # model.resolution_anchor_feat
    num_transformer: int = 3
    window_transformer: int = 5
    num_frames: int = 30                # dataset.clip_num_frames
    freeze_backbone: bool = True        # model.fix_backbone
    # local DINO/DINOv2/MAE torch checkpoint imported via
    # models.vit.load_torch_vit_checkpoint (the reference torch.hub-loads
    # these; zero-egress environments need the file on disk)
    vit_ckpt: str = ""
    categories_per_task: int = 400      # QIL split width
    batch_size: int = 4                 # train.batch_size
    lr: float = 3e-4                    # train.lr
    weight_decay: float = 5e-3          # train.weight_decay
    accumulation_steps: int = 1         # train.accumulation_step
    use_hnm: bool = True                # hard-negative mining across batch
    augment: bool = True                # train.aug_clip
    positive_threshold: float = 0.2     # model.positive_threshold
    positive_topk: int = 5              # model.positive_topk
    use_query_roi: bool = False         # train.use_query_roi (ref default
    #                                     False; model-level capability)


@dataclass(frozen=True)
class Config(_Base):
    """Top-level experiment configuration."""

    task: str = "mq"                # mq | nlq | vq
    # array storage for task checkpoints: "npz" (single zip) or "orbax"
    # (tensorstore/OCDBT dir — the TPU-native layout for large params)
    ckpt_format: str = "npz"
    init_rand_seed: int = 0
    train_split: Tuple[str, ...] = ("train",)
    val_split: Tuple[str, ...] = ("val",)
    output_folder: str = "./logs/"
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train_cfg: TrainCfg = field(default_factory=TrainCfg)
    test_cfg: TestCfg = field(default_factory=TestCfg)
    cl_cfg: CLCfg = field(default_factory=CLCfg)
    opt: OptCfg = field(default_factory=OptCfg)
    loader: LoaderCfg = field(default_factory=LoaderCfg)
    vq: VQCfg = field(default_factory=VQCfg)

    def derived(self) -> "Config":
        """Propagate dataset dims into the model config.

        Mirrors `_update_config` (MQ/libs/core/config.py:189-197).
        """
        model = self.model.updated(
            input_dim=self.dataset.input_dim,
            num_classes=self.dataset.num_classes,
            max_seq_len=self.dataset.max_seq_len,
            dropout=self.train_cfg.dropout,
            droppath=self.train_cfg.droppath,
            t_c_alpha=self.train_cfg.t_c_alpha,
        )
        cl_cfg = self.cl_cfg
        if cl_cfg.embed_dim != model.n_txt_in:
            # L2P prompts are PREPENDED to the raw text tokens
            # (meta_archs.py:759-780), so the pool's embed_dim must equal
            # the text-token dim; the reference hardcodes both to the CLIP
            # 768 (cl_cfg embed_dim, MQ/libs/core/config.py:121/150) —
            # follow the text dim so non-CLIP feature sets work too
            cl_cfg = cl_cfg.updated(embed_dim=model.n_txt_in)
        return self.updated(model=model, cl_cfg=cl_cfg)


_SUBCONFIG_TYPES = {
    (Config, "dataset"): DatasetConfig,
    (Config, "model"): ModelConfig,
    (Config, "train_cfg"): TrainCfg,
    (Config, "test_cfg"): TestCfg,
    (Config, "cl_cfg"): CLCfg,
    (Config, "opt"): OptCfg,
    (Config, "loader"): LoaderCfg,
    (Config, "vq"): VQCfg,
}


def load_config(path: str) -> Config:
    """Load a YAML config merged over the typed defaults."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return Config.from_dict(raw).derived()
