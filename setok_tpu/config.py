"""Frozen configuration tree for the TPU-native SeTok / Setokim rebuild.

Parity: /root/reference/src/train/training_utils.py:6-141 defines 8 flat
HfArgumentParser dataclass groups whose values are partially mutated after
parsing (e.g. train_setokim.py:360-365 hard-codes generator dims). Here the
same knobs live in one immutable tree; model code receives sub-configs and
never mutates them, so a config hash keys a single XLA compilation.

TPU-first deviations from the reference (documented per SURVEY.md §7):
  * `k_max` — clustering emits a fixed-size (k_max, D) token tensor plus a
    validity mask instead of a variable number of tokens, so the whole
    encode→cluster→decode graph is static-shaped under jit.
  * `param_dtype` / `compute_dtype` — explicit mixed-precision policy
    (bf16 activations on MXU, fp32 params/optimizer) instead of the
    reference's scattered fp16/bf16/tf32 flags.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ViTConfig:
    """SigLIP-style ViT feature extractor (frozen backbone).

    Parity: /root/reference/src/model/setok/clip_encoder.py:8-93 wraps a HF
    AutoModel ('google/siglip-so400m-patch14-384'); here the ViT is native.
    """

    image_size: int = 256
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    # Which hidden layer to tap features from (-1 = last, -2 = penultimate),
    # mirroring mm_vision_select_layer (training_utils.py:25).
    select_layer: int = -1
    # 'patch' drops any class token; SigLIP has none, so this is a no-op kept
    # for config parity (clip_encoder.py:40-48).
    select_feature: str = "patch"
    use_class_token: bool = False
    # Smaller-N experiment (no reference equivalent): merge 2x2 patch
    # neighborhoods (space-to-depth + linear) after this block index, so the
    # remaining depth and everything downstream (clustering, group encode)
    # runs at N/4 sequence length. None = off (parity default). See PERF.md
    # "token-merge" for the measured speed/quality trade.
    merge_layer: Optional[int] = None
    # Initialize merge_proj to the exact 2x2 average-pool operator
    # (0.25·[I;I;I;I]) instead of random. A random-init merge projection
    # scrambles the (frozen) pre-merge features, so the whole post-merge
    # path must train from scratch — a moving target the detokenizer
    # chases (r4 quality A/B: merged SSIM 0.06 on its own train set vs
    # 0.16 for the frozen baseline). Pool-init makes the merged path
    # meaningful at init, so the backbone can stay FULLY frozen under
    # freeze_backbone (baseline-identical training dynamics); with
    # freeze_backbone=False it is simply a good init to refine.
    merge_pool_init: bool = True

    def __post_init__(self):
        if self.merge_layer is not None:
            if not 0 <= self.merge_layer < self.depth:
                raise ValueError(
                    f"merge_layer ({self.merge_layer}) must be in "
                    f"[0, depth={self.depth}) — a merge after the last block "
                    "would be dead code")
            if self.grid % 2 != 0:
                raise ValueError(
                    f"merge_layer needs an even patch grid for the 2x2 fold; "
                    f"got image_size={self.image_size} / "
                    f"patch_size={self.patch_size} → grid {self.grid}")
            if self.use_class_token:
                raise ValueError("merge_layer requires use_class_token=False "
                                 "(no grid slot for the cls token)")
            tap = (self.select_layer if self.select_layer >= 0
                   else self.depth + self.select_layer)
            if tap < self.merge_layer:
                raise ValueError(
                    f"select_layer ({self.select_layer} → block {tap}) taps "
                    f"a PRE-merge block while merge_layer={self.merge_layer}"
                    " — the merge and every post-merge block would be dead "
                    "compute, and num_output_patches would misreport the "
                    "tapped patch count; move the merge before the tap or "
                    "drop it")

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_output_patches(self) -> int:
        """Patch count the ViT emits: num_patches, /4 after a 2x2 merge.

        __post_init__ rejects select_layer tapping a pre-merge block, so a
        set merge_layer always means the tapped features are merged."""
        n = self.num_patches
        return n // 4 if self.merge_layer is not None else n


@dataclass(frozen=True)
class TokenizerConfig:
    """SetokTokenizer: features → DPC-KNN clusters → concept tokens.

    Parity: /root/reference/src/model/setok/tokenizer.py:14-33 defaults
    (hidden_dim, token_feat_dim, min_cluster_num, threshold=0.55 per
    training_utils.py:30, nheads, dim_feedforward, inner/intra layers).
    """

    vit: ViTConfig = field(default_factory=ViTConfig)
    hidden_dim: int = 768          # must equal vit.width (ref adds pos-emb in place)
    token_feat_dim: int = 768
    min_cluster_num: int = 64
    threshold: float = 0.55
    nheads: int = 2
    dim_feedforward: int = 3072
    inner_cluster_layers: int = 2
    intra_cluster_layers: int = 2
    proj_drop: float = 0.2
    attn_drop: float = 0.0
    # TPU recast: static upper bound on cluster count. COCO caps segments at
    # 74 (pairDataset.py:136), so 80 is a safe envelope; tests shrink it.
    k_max: int = 80
    # k for the k-NN density estimate (ref reuses min_cluster_num as k,
    # tokenizer.py:172).
    knn: int = 64
    # Fused Pallas DPC-KNN (kernels/cluster_pallas.py): VMEM-tiled distance
    # passes instead of the materialized N×N cdist. Unmasked inputs only —
    # token_mask falls back to the XLA path.
    use_pallas_cluster: bool = True
    # Scale-invariant DPC-KNN (ops/clustering.py dist_norm; NOT in the
    # reference, default off = exact parity): distances are normalized by
    # their mean before density/score, so `threshold` reads in units of the
    # mean pairwise distance and adaptive-K survives feature-scale changes
    # (the merge variant's LN'd features sit at a different scale than the
    # raw frozen-backbone features the reference's threshold is calibrated
    # on — PERF.md "adaptive-K on merged features").
    cluster_dist_norm: bool = False

    def __post_init__(self):
        # Cluster knobs must fit the patch count the ViT actually emits
        # (merge_layer shrinks it 4x) — lax.top_k(k > N) is a crash.
        n = self.vit.num_output_patches
        for name, v in (("k_max", self.k_max), ("knn", self.knn),
                        ("min_cluster_num", self.min_cluster_num)):
            if v > n:
                raise ValueError(
                    f"{name} ({v}) exceeds the ViT's output patch count "
                    f"N={n}" + (" (after the 2x2 token merge)"
                                if self.vit.merge_layer is not None else "")
                    + " — lax.top_k would fail; shrink it or drop merge_layer")


@dataclass(frozen=True)
class DetokenizerConfig:
    """SetokDeTokenizer: concept tokens → Q-Former mapper → pixel decoder.

    Parity: /root/reference/src/model/setok/detokenizer.py:15-31 plus the
    explicit pixel head the reference forward omits (detokenizer.py:117-123
    ends without projecting to pixels or returning; we add
    Linear(decoder_embed_dim → patch²·3) + unpatchify per the MAR lineage,
    cf. setokim_llama.py:194-204 unpatchify).
    """

    token_feat_dim: int = 768
    hidden_dim: int = 768          # Q-Former width (ref hard-codes 768 at train_setokim.py:360-365)
    patch_size: int = 16
    image_size: int = 256
    decoder_embed_dim: int = 768
    decoder_nheads: int = 16
    decoder_depth: int = 16
    mlp_ratio: float = 4.0
    # Q-Former mapper (BLIP-2 lineage, module.py:728-1013): self-attn over
    # queries, cross-attn to tokens every `cross_attention_freq` layers,
    # query-only FFN (the reference strips the text FFN, detokenizer.py:94-96).
    mapper_layers: int = 6
    mapper_heads: int = 12
    cross_attention_freq: int = 2
    initializer_range: float = 0.02
    proj_drop: float = 0.2
    attn_drop: float = 0.2

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_mask_tokens(self) -> int:
        return self.grid * self.grid


@dataclass(frozen=True)
class GANLossConfig:
    """Parity: training_utils.py:66-70 + discriminator.py:31-57."""

    disc_in_channels: int = 3
    disc_num_layers: int = 2
    disc_start: int = 5000
    warm_up_end: int = 200
    disc_loss: str = "hinge"
    use_adaptive_weight: bool = True
    weight: float = 1.0
    factor: float = 1.0


@dataclass(frozen=True)
class ContrastiveLossConfig:
    """Parity: training_utils.py:72-78 + multilabel_constrastive.py:27-51."""

    contrast_temperature: float = 0.07
    multi_label: int = 0
    share_temperature: bool = False
    multi_label_loss_weight: float = 1.0
    text_embed_dim: int = 768


@dataclass(frozen=True)
class DiffLossConfig:
    """MAR diffusion head. Parity: training_utils.py:80-87 + diffloss.py:9-24."""

    target_channels: int = 768      # detokenizer token dim being denoised
    z_channels: int = 768           # conditioning width (LLM hidden)
    width: int = 1024               # diffloss_w... reference w=3 is depth; see note
    depth: int = 3                  # SimpleMLPAdaLN res blocks (diffloss_w=3)
    num_sampling_steps: str = "100"
    diffusion_batch_mul: int = 4
    mask_ratio_min: float = 0.7
    grad_checkpointing: bool = False


@dataclass(frozen=True)
class LlamaConfig:
    """LLaMA trunk for Setokim. Defaults are a test-scale model; `vicuna_7b`
    preset matches the reference target (scripts/finetune.sh)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_embeddings: bool = False


@dataclass(frozen=True)
class SetokimConfig:
    """Full MLLM: LLaMA trunk + SeTok tokenizer/detokenizer + projectors +
    diffusion head. Parity: setokim_arch.py:30-183 module inventory."""

    llama: LlamaConfig = field(default_factory=LlamaConfig)
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    detokenizer: DetokenizerConfig = field(default_factory=DetokenizerConfig)
    diffloss: DiffLossConfig = field(default_factory=DiffLossConfig)
    mm_in_projector_type: str = "mlp2x_gelu"
    mm_out_projector_type: str = "mlp2x_gelu"
    mm_use_im_start_end: bool = True
    # number of <target> placeholder tokens a generation span expands to
    # (base_dataset.py:123-127 expands <target> to target_num copies).
    # Must equal tokenizer.k_max (the static token budget per image);
    # None derives it, so SetokimConfig() is self-consistent by default.
    target_num: Optional[int] = None

    def __post_init__(self):
        if self.target_num is None:
            object.__setattr__(self, "target_num", self.tokenizer.k_max)
        elif self.target_num != self.tokenizer.k_max:
            raise ValueError(
                f"target_num ({self.target_num}) must equal tokenizer.k_max "
                f"({self.tokenizer.k_max}): a generation span expands to one "
                "<target> slot per static token.")


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. data = DP/FSDP shards, model = TP shards."""

    data: int = 1
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    disc_learning_rate: float = 1e-3
    weight_decay: float = 0.0
    # Global-norm gradient clip. The reference never sets max_grad_norm, so
    # HF Trainer's default 1.0 applies to every reference training run
    # (transformers TrainingArguments.max_grad_norm; Trainer clips the
    # accumulated gradient once per optimizer update). 0 disables.
    max_grad_norm: float = 1.0
    beta1: float = 0.9
    beta2: float = 0.999
    warmup_steps: int = 100
    total_steps: int = 10000
    batch_size: int = 24
    # micro-batches accumulated (mean) per optimizer update — HF
    # gradient_accumulation_steps equivalent (stage-2; optax.MultiSteps)
    grad_accum_steps: int = 1
    seed: int = 0
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    remat: bool = True
    mesh: MeshConfig = field(default_factory=MeshConfig)
    contrastive_weight: float = 1.0
    rec_l1_weight: float = 1.0
    lpips_weight: float = 1.0


# ----------------------------------------------------------------------------
# Presets


def tiny_tokenizer(image_size: int = 32, patch_size: int = 8) -> TokenizerConfig:
    """Small config for unit tests (runs on CPU in seconds)."""
    vit = ViTConfig(image_size=image_size, patch_size=patch_size, width=32,
                    depth=2, num_heads=2)
    return TokenizerConfig(vit=vit, hidden_dim=32, token_feat_dim=32,
                           min_cluster_num=4, threshold=0.55, nheads=2,
                           dim_feedforward=64, k_max=8, knn=4)


def tiny_detokenizer(image_size: int = 32, patch_size: int = 8) -> DetokenizerConfig:
    return DetokenizerConfig(token_feat_dim=32, hidden_dim=32,
                             patch_size=patch_size, image_size=image_size,
                             decoder_embed_dim=32, decoder_nheads=2,
                             decoder_depth=2, mapper_layers=2, mapper_heads=2)


def base_tokenizer() -> TokenizerConfig:
    """Bench flagship: ViT-B/16 @256 encoder (BASELINE.json config 1)."""
    return TokenizerConfig()


def base_detokenizer() -> DetokenizerConfig:
    return DetokenizerConfig()


def so400m_vit() -> ViTConfig:
    """SigLIP so400m-patch14-384 geometry (the reference's default tower,
    tokenizer.py:15): width 1152, depth 27, heads 16, MLP 4304, 729 patches.
    select_layer -2 per mm_vision_select_layer (tokenizer.py:18)."""
    return ViTConfig(image_size=384, patch_size=14, width=1152, depth=27,
                     num_heads=16, mlp_ratio=4304 / 1152, select_layer=-2)


def so400m_tokenizer() -> TokenizerConfig:
    """Reference-scale tokenizer (tokenizer.py:20-25 defaults): hidden_dim
    4096, token_feat_dim 4096, dim_feedforward 4096, threshold 0.5."""
    return TokenizerConfig(vit=so400m_vit(), hidden_dim=4096,
                           token_feat_dim=4096, min_cluster_num=64,
                           threshold=0.5, nheads=2, dim_feedforward=4096,
                           inner_cluster_layers=2, intra_cluster_layers=2,
                           k_max=80, knn=64)


def so400m_detokenizer() -> DetokenizerConfig:
    """Reference-scale detokenizer (detokenizer.py:15-31 defaults):
    patch 14 @256 (grid 18 → 324 queries), decoder_embed_dim 4096, depth 16;
    Q-Former mapper width 768 (hard-coded at train_setokim.py:360-365)."""
    return DetokenizerConfig(token_feat_dim=4096, hidden_dim=768,
                             patch_size=14, image_size=256,
                             decoder_embed_dim=4096, decoder_nheads=16,
                             decoder_depth=16, mapper_layers=6,
                             mapper_heads=12, cross_attention_freq=2)


def tiny_llama() -> LlamaConfig:
    return LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
                       max_seq_len=256)


def vicuna_7b() -> LlamaConfig:
    return LlamaConfig()


def tiny_setokim() -> SetokimConfig:
    tok = tiny_tokenizer()
    det = tiny_detokenizer()
    llama = tiny_llama()
    diff = DiffLossConfig(target_channels=tok.token_feat_dim,
                          z_channels=det.token_feat_dim, width=32, depth=1,
                          num_sampling_steps="4", diffusion_batch_mul=2)
    return SetokimConfig(llama=llama, tokenizer=tok, detokenizer=det,
                         diffloss=diff, target_num=tok.k_max)


def base_setokim() -> SetokimConfig:
    """Flagship: Vicuna-7B trunk + ViT-B SeTok (scripts/finetune.sh shape)."""
    tok = base_tokenizer()
    det = base_detokenizer()
    diff = DiffLossConfig(target_channels=tok.token_feat_dim,
                          z_channels=det.token_feat_dim, width=1024, depth=3,
                          num_sampling_steps="100")
    return SetokimConfig(llama=vicuna_7b(), tokenizer=tok, detokenizer=det,
                         diffloss=diff, target_num=tok.k_max)


def replace(cfg, **kw):
    """Functional config update (configs are frozen)."""
    return dataclasses.replace(cfg, **kw)
