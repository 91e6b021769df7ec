"""Single config tree for the whole framework.

The reference scatters constants across files (SAM2 ckpt at
sam2_masker.py:19-20, HF ids + "2-Step" at diffuerase.py:37-44, ProPainter
knobs at diffuerase.py:53-55, preview N=22 at videovanish.py:1572, GUI
spinbox defaults at videovanish.py:1212-1231). Here they live in one
dataclass tree with CLI overrides; the reference's exact CLI flags are kept
by the `cli/` layer.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class PrecisionConfig:
    # bf16 compute on the MXU, f32 params/accumulation.
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # f32 accumulation inside attention softmax / GroupNorm statistics.
    accum_dtype: str = "float32"


@dataclass(frozen=True)
class MeshConfig:
    """Logical mesh axes. Shapes are resolved against jax.devices() at runtime.

    data  : frames / temporal chunks (DP + sequence parallel)
    model : attention heads / MLP channels (TP)
    """
    data: int = -1  # -1: all remaining devices
    model: int = 1


@dataclass(frozen=True)
class Sam2Config:
    """Hiera-L SAM2.1 video predictor (reference: sam2.1_hiera_l.yaml,
    sam2_masker.py:19-20)."""
    checkpoint: str = "checkpoints/sam2.1_hiera_large.orbax"
    image_size: int = 1024
    # Hiera-L stages (public SAM2.1-hiera-large architecture)
    hiera_embed_dim: int = 144
    hiera_num_heads: int = 2
    hiera_stages: tuple[int, ...] = (2, 6, 36, 4)
    hiera_window_spec: tuple[int, ...] = (8, 4, 16, 8)
    hiera_global_att_blocks: tuple[int, ...] = (23, 33, 43)
    hiera_window_pos_embed_bkg_spatial_size: tuple[int, int] = (7, 7)
    # FPN neck
    neck_d_model: int = 256
    backbone_channel_list: tuple[int, ...] = (1152, 576, 288, 144)
    # memory attention / memory encoder
    mem_dim: int = 64
    num_maskmem: int = 7  # ring buffer of 6 recent + 1 conditioning slot
    max_obj_ptrs_in_encoder: int = 16
    memory_attention_layers: int = 4
    memory_attention_d_model: int = 256
    # mask decoder
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    # host->device frame wire format during propagation: "yuv420" ships
    # 2x fewer bytes over the serial link (2x2 chroma subsampling,
    # imperceptible for masking and the masks get dilated downstream);
    # "rgb" is bit-exact vs the official input path (parity tests use it)
    wire: str = "yuv420"


@dataclass(frozen=True)
class ProPainterConfig:
    """Flow-guided inpainting prior (reference call surface
    diffuerase.py:52-57). Architecture dims follow the published
    ProPainter checkpoints: three weight files like the reference's
    (raft-things / recurrent_flow_completion / ProPainter)."""
    checkpoint: str = "checkpoints/propainter.orbax"  # InpaintGenerator
    raft_checkpoint: str = "checkpoints/raft_things.orbax"
    flowcomp_checkpoint: str = "checkpoints/recurrent_flow_completion.orbax"
    ref_stride: int = 10
    neighbor_length: int = 10
    subvideo_length: int = 50
    raft_iters: int = 20  # published inference default (RAFT_bi iters)
    # internal processing resolution cap (long side), multiple of 8.
    # Flow/propagation run at reduced resolution: the all-pairs RAFT
    # correlation is quadratic in tokens — 432 long side keeps a
    # 50-frame subvideo's volumes in HBM.
    max_img_size: int = 432
    # InpaintGenerator dims (128/512/8 are the published sizes; tiny
    # config scales them down for CPU smoke)
    channels: int = 128
    hidden: int = 512
    depths: int = 8
    num_heads: int = 4
    window: tuple[int, int] = (5, 9)
    pool: tuple[int, int] = (4, 4)
    t_dilation: int = 2
    ffn_channels: int = 40   # FusionFeedForward hidden = 49 * this
    flowcomp_base: int = 32  # RecurrentFlowCompleteNet stem width


@dataclass(frozen=True)
class DiffuEraserConfig:
    """BrushNet-conditioned SD1.5 UNet + temporal attention + PCM 2-step.

    Reference call surface diffuerase.py:39-45,60-67; HF ids:
    stable-diffusion-v1-5, sd-vae-ft-mse, lixiaowen/diffuEraser, ckpt "2-Step".
    """
    checkpoint: str = "checkpoints/diffueraser.orbax"
    vae_checkpoint: str = "checkpoints/sd_vae_ft_mse.orbax"
    ckpt: str = "2-Step"  # PCM phased-consistency 2-step LoRA schedule
    num_inference_steps: int = 2
    guidance_scale: float = 0.0  # reference default (diffuerase.py:61)
    max_img_size: int = 960  # long side, multiple of 8 (videovanish.py:1215)
    # interactive preview tier: the GUI's 22-frame infill preview
    # (videovanish.py:1572) runs at this lower inference resolution so
    # click-to-picture stays interactive (~(640/960)^2 = 0.44x device
    # work); the final Make Vanish always renders at max_img_size. The
    # reference previews at the dock resolution — this is a deliberate
    # latency/quality trade, opt out with preview_img_size = 0.
    preview_img_size: int = 640
    # temporal clip handling (DiffuEraser-style overlapping windows)
    clip_length: int = 22  # frames per temporal window (matches preview N=22)
    clip_overlap: int = 6
    # FRDiff-style acceleration (PAPERS.md): compute BrushNet features at
    # the first PCM step only and reuse them for later steps (~25% less
    # denoise compute). Measured vs the exact path through the full e2e
    # torch-reference pipeline: 56.4 dB PSNR (tests/test_e2e_quality.py::
    # test_brushnet_feature_reuse_cost), far above the 45 dB quality gate,
    # so it ships on. Set False for bit-exact reference parity.
    brushnet_feature_reuse: bool = True
    # TGATE/DeepCache-style cross-step reuse of the UNet's Transformer2D
    # attention outputs (spatial self + text cross): record at PCM step
    # 1, replay at step 2+ (motion-module TEMPORAL attention always
    # recomputes). Measured 2026-08-21: denoise_window 1872 -> 1622
    # ms/exec at 720p, quality cost ~nil — 75.5 dB on-vs-off at
    # production geometry (test_e2e_quality_prod.py::
    # test_spatial_attn_reuse_delta_at_960) and 56.38 vs 56.40 dB
    # against the exact torch oracle at tiny geometry
    # (test_e2e_quality.py::test_spatial_attn_reuse_cost) — both far
    # above the 45 dB e2e gate, same decision bar as
    # brushnet_feature_reuse. Set False for bit-exact reference parity.
    spatial_attn_reuse: bool = True
    # SD1.5 UNet shape
    sample_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    # VAE
    vae_latent_channels: int = 4
    vae_block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    vae_scaling_factor: float = 0.18215


@dataclass(frozen=True)
class InfillConfig:
    """run_infill_on_frames defaults (reference diffuerase.py:20-21)."""
    mask_dilation_iter: int = 8
    keep_unmasked_original: bool = True
    feather_px: int = 3
    max_img_size: int = 960


@dataclass(frozen=True)
class ChunkingConfig:
    """First-class long-video chunking (reference left this as a TODO,
    README.md:76; deps chunk internally at subvideo_length=50)."""
    chunk_frames: int = 48
    overlap_frames: int = 8
    # f32 deterministic accumulation for bitwise-stable blending (north star)
    blend_dtype: str = "float32"


@dataclass(frozen=True)
class VideoConfig:
    """Host I/O edge (reference tools.py:4-45)."""
    fourcc: str = "FFV1"  # lossless, .mkv
    prefetch_chunks: int = 2


@dataclass(frozen=True)
class VVConfig:
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    sam2: Sam2Config = field(default_factory=Sam2Config)
    propainter: ProPainterConfig = field(default_factory=ProPainterConfig)
    diffueraser: DiffuEraserConfig = field(default_factory=DiffuEraserConfig)
    infill: InfillConfig = field(default_factory=InfillConfig)
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    video: VideoConfig = field(default_factory=VideoConfig)

    def replace(self, **kw: Any) -> "VVConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> VVConfig:
    return VVConfig()


def tiny_config() -> VVConfig:
    """CPU-runnable smoke config (BASELINE.json config 1): tiny channel
    counts, short clips. Used by tests and the 48x256x256 smoke path."""
    return VVConfig(
        diffueraser=DiffuEraserConfig(
            max_img_size=256,
            clip_length=8,
            clip_overlap=2,
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            cross_attention_dim=64,
            attention_head_dim=8,
            vae_block_out_channels=(16, 32, 32, 32),
        ),
        propainter=ProPainterConfig(
            max_img_size=256, raft_iters=2, channels=32, hidden=128,
            depths=2, ffn_channels=5, flowcomp_base=8,
            neighbor_length=4, ref_stride=4, subvideo_length=16,
        ),
        sam2=Sam2Config(
            image_size=128,
            hiera_embed_dim=32,
            hiera_stages=(1, 2, 2, 1),
            hiera_window_spec=(4, 4, 4, 4),
            hiera_global_att_blocks=(3,),
            backbone_channel_list=(256, 128, 64, 32),
            neck_d_model=64,
            mem_dim=16,
            memory_attention_layers=2,
            memory_attention_d_model=64,
            max_obj_ptrs_in_encoder=4,
        ),
        chunking=ChunkingConfig(chunk_frames=8, overlap_frames=2),
    )


def dryrun_config() -> VVConfig:
    """Minimal config for the driver's n-device CPU dryrun
    (__graft_entry__.dryrun_multichip): the same program structure as
    tiny_config but every knob at its floor so one full
    run_infill_on_frames pass on a 1-core host takes seconds-to-a-couple
    of minutes, not the ~9 min of the tiny-config SPMD test
    (tests/conftest.py SLOW_TESTS). 64x64 frames is the floor — the VAE
    downsamples 8x and the UNet halves 3 more times, so the latent must
    be divisible by 8."""
    return VVConfig(
        diffueraser=DiffuEraserConfig(
            max_img_size=64,
            # already a multiple of the dryrun's 8-device data axis:
            # the mesh path rounds clip_length up to the axis size
            # (pipeline/infill._get_models), and a plan that differs
            # from the single-device golden's would blend differently
            clip_length=8,
            clip_overlap=2,
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=8,
            vae_block_out_channels=(8, 16, 16, 16),
        ),
        propainter=ProPainterConfig(
            max_img_size=64, raft_iters=1, channels=16, hidden=64,
            depths=1, ffn_channels=2, flowcomp_base=8, num_heads=2,
            neighbor_length=2, ref_stride=4, subvideo_length=8,
        ),
        sam2=Sam2Config(
            image_size=64,
            hiera_embed_dim=32,
            hiera_stages=(1, 1, 1, 1),
            hiera_window_spec=(4, 4, 4, 4),
            hiera_global_att_blocks=(2,),
            backbone_channel_list=(256, 128, 64, 32),
            neck_d_model=32,
            mem_dim=16,
            memory_attention_layers=1,
            memory_attention_d_model=64,
            max_obj_ptrs_in_encoder=4,
        ),
        chunking=ChunkingConfig(chunk_frames=8, overlap_frames=2),
    )
