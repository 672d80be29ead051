"""Layered CLI options with flag-for-flag parity with the reference.

Re-design of the reference options package (options/base_options.py:11-127,
options/train_options.py:5-74, options/test_options.py:4-17,
options/audio_config.py:1-13): the same flags, defaults, and ``opt.txt``
persistence, minus CUDA-isms (``--gpu_ids`` is accepted but only used to pick
how many local devices join the data-parallel mesh; ``--fp16`` selects the
bf16 compute policy — TPUs need no GradScaler).

Dead reference flags (ONNX/TRT export, cluster_path, vestigial pix2pixHD image
options) are accepted for CLI compatibility but unused, exactly like in the
reference where they are parsed and never read.
"""

from __future__ import annotations

import argparse
import os

# audio_config.py:1-13 constants
N_FFT = 512
HOP_LENGTH = 256
WIN_LENGTH = 512
LR_SAMPLE_RATE = 8000
HR_SAMPLE_RATE = 48000
SR_SAMPLE_RATE = 48000
BINS = 128
CENTER = True
FRAME_LENGTH = (BINS - 1) * HOP_LENGTH if CENTER else (BINS - 1) * HOP_LENGTH + WIN_LENGTH


def _param_key_map(x: str):
    # train_options.py:25 lambda type: "a:b,c:d" -> {"a": "b", "c": "d"}
    return {str(k): str(v) for k, v in (i.split(":") for i in x.split(","))}


class BaseOptions:
    def __init__(self):
        self.parser = argparse.ArgumentParser()
        self.initialized = False
        self.isTrain = True

    def initialize(self):
        p = self.parser
        # experiment specifics (base_options.py:12-24)
        p.add_argument("--name", type=str, default="label2city")
        p.add_argument("--gpu_ids", type=str, default="0",
                       help="device ids joining the data-parallel mesh; -1 for CPU")
        p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
        p.add_argument("--model", type=str, default="pix2pixHD")
        p.add_argument("--norm", type=str, default="instance")
        p.add_argument("--use_dropout", action="store_true")
        p.add_argument("--data_type", default=32, type=int, choices=[8, 16, 32])
        p.add_argument("--verbose", action="store_true", default=False)
        p.add_argument("--fp16", action="store_true", default=False,
                       help="bf16 compute policy (TPU equivalent of AMP)")
        p.add_argument("--fused_mdct", type=str, default="auto",
                       choices=["auto", "on", "off"],
                       help="fused Pallas MDCT/IMDCT+normalize kernels: auto "
                            "enables on a single TPU chip when the spectral "
                            "config is compatible")
        p.add_argument("--upsample_method", type=str, default="auto",
                       choices=["auto", "dilated", "phase", "dense"],
                       help="upsample-conv fusion form (equal math; auto = "
                            "dilated, the measured-fastest on v5e — "
                            "docs/PERFORMANCE.md)")
        p.add_argument("--head_phases", type=str, default="",
                       help="tanh-head polyphase fold: '16' (1-D) or '4x8' "
                            "(2-D, the shipped default); empty = auto")
        p.add_argument("--dilated_vjp", type=str, default="",
                       choices=["", "1", "gx", "0"],
                       help="dilated-upsample backward form: '1' = all-custom"
                            " VJP (shipped default), 'gx' = custom grad-x +"
                            " autodiff grad-k, '0' = raw autodiff; empty ="
                            " default")
        p.add_argument("--matmul_precision", type=str, default="default",
                       choices=["default", "high", "highest"],
                       help="JAX default matmul/conv precision for ops that "
                            "do not pin one (the spectral transforms always "
                            "run HIGHEST).  On TPU 'default' runs f32 convs "
                            "as single-pass bf16 — measured ~4e-2 relative "
                            "vs a float64 oracle through the flagship "
                            "serving chain (fine for LSD-class metrics); "
                            "'highest' buys back f32 exactness at ~3x conv "
                            "cost (docs/PERFORMANCE.md 'Flagship inference "
                            "parity')")
        p.add_argument("--local_rank", type=int, default=0)
        p.add_argument("--seed", type=int, default=42)
        p.add_argument("--fit_residual", action="store_true", default=False)

        # input/output sizes (base_options.py:27-32)
        p.add_argument("--batchSize", type=int, default=1)
        p.add_argument("--loadSize", type=int, default=1024)
        p.add_argument("--fineSize", type=int, default=512)
        p.add_argument("--label_nc", type=int, default=0)
        p.add_argument("--input_nc", type=int, default=2)
        p.add_argument("--output_nc", type=int, default=1)

        # inputs / normalization (base_options.py:35-49)
        p.add_argument("--dataroot", type=str, default="./datasets/vctk/train.csv")
        p.add_argument("--evalroot", type=str, default="./datasets/vctk/test.csv")
        p.add_argument("--serial_batches", action="store_true")
        p.add_argument("--nThreads", default=2, type=int)
        p.add_argument("--max_dataset_size", type=float, default=float("inf"))
        p.add_argument("--explicit_encoding", action="store_true")
        p.add_argument("--alpha", type=float, default=0.6)
        p.add_argument("--norm_range", type=float, default=(0, 1), nargs=2)
        p.add_argument("--abs_norm", action="store_true")
        p.add_argument("--src_range", type=float, default=(-5, 5), nargs=2)
        p.add_argument("--arcsinh_transform", action="store_true")
        p.add_argument("--raw_mdct", action="store_true")
        p.add_argument("--arcsinh_gain", type=float, default=500)
        p.add_argument("--add_noise", action="store_true")
        p.add_argument("--snr", type=float, default=55)

        # displays (base_options.py:52-53)
        p.add_argument("--display_winsize", type=int, default=512)
        p.add_argument("--tf_log", action="store_true")

        # generator (base_options.py:56-73)
        p.add_argument("--netG", type=str, default="global")
        p.add_argument("--ngf", type=int, default=64)
        p.add_argument("--upsample_type", type=str, default="transconv")
        p.add_argument("--downsample_type", type=str, default="conv")
        p.add_argument("--n_downsample_global", type=int, default=4)
        p.add_argument("--n_blocks_global", type=int, default=9)
        p.add_argument("--n_blocks_attn_g", type=int, default=1)
        p.add_argument("--proj_factor_g", type=int, default=4)
        p.add_argument("--dim_head_g", type=int, default=128)
        p.add_argument("--heads_g", type=int, default=4)
        p.add_argument("--n_blocks_local", type=int, default=3)
        p.add_argument("--n_blocks_attn_l", type=int, default=0)
        p.add_argument("--proj_factor_l", type=int, default=4)
        p.add_argument("--dim_head_l", type=int, default=128)
        p.add_argument("--heads_l", type=int, default=4)
        p.add_argument("--n_local_enhancers", type=int, default=1)
        p.add_argument("--niter_fix_global", type=int, default=0)

        # input mask options (base_options.py:86-90)
        p.add_argument("--mask", action="store_true")
        p.add_argument("--smooth", type=float, default=0.0)
        p.add_argument("--mask_hr", action="store_true")
        p.add_argument("--mask_mode", type=str, default=None)
        p.add_argument("--min_value", type=float, default=1e-7)

        self.initialized = True

    def parse(self, args=None, save: bool = True):
        if not self.initialized:
            self.initialize()
        self.opt = self.parser.parse_args(args)
        self.opt.isTrain = self.isTrain

        # the perf-form selectors resolve at TRACE time through env hooks
        # (models/layers.py reads them when "auto"); the flags set those
        # hooks centrally for every CLI.  An explicit env var set by the
        # user keeps winning when the flag is at its default.
        if self.opt.upsample_method != "auto":
            os.environ["MDCTGAN_UPSAMPLE_METHOD"] = self.opt.upsample_method
        if self.opt.head_phases:
            os.environ["MDCTGAN_HEAD_PHASES"] = self.opt.head_phases
        if self.opt.dilated_vjp:
            os.environ["MDCTGAN_DILATED_VJP"] = self.opt.dilated_vjp

        str_ids = str(self.opt.gpu_ids).split(",")
        self.opt.gpu_ids = [int(s) for s in str_ids if int(s) >= 0]

        d = vars(self.opt)
        print("------------ Options -------------")
        for k, v in sorted(d.items()):
            print(f"{k}: {v}")
        print("-------------- End ----------------")

        expr_dir = os.path.join(self.opt.checkpoints_dir, self.opt.name)
        os.makedirs(expr_dir, exist_ok=True)
        if save and not getattr(self.opt, "continue_train", False):
            with open(os.path.join(expr_dir, "opt.txt"), "wt") as f:
                f.write("------------ Options -------------\n")
                for k, v in sorted(d.items()):
                    f.write(f"{k}: {v}\n")
                f.write("-------------- End ----------------\n")
        return self.opt


class TrainOptions(BaseOptions):
    def initialize(self):
        BaseOptions.initialize(self)
        p = self.parser
        # displays (train_options.py:8-17)
        p.add_argument("--display_freq", type=int, default=200)
        p.add_argument("--print_freq", type=int, default=100)
        p.add_argument("--save_latest_freq", type=int, default=1000)
        p.add_argument("--save_epoch_freq", type=int, default=10)
        p.add_argument("--eval_freq", type=int, default=32000)
        p.add_argument("--loss_update_freq", type=int, default=256)
        p.add_argument("--no_html", action="store_true")
        p.add_argument("--debug", action="store_true")
        p.add_argument("--abs_spectro", action="store_true")

        # training (train_options.py:20-38)
        p.add_argument("--continue_train", action="store_true")
        p.add_argument("--freeze_g_d", action="store_true")
        p.add_argument("--freeze_g_u", action="store_true")
        p.add_argument("--freeze_l_d", action="store_true")
        p.add_argument("--freeze_l_u", action="store_true")
        p.add_argument("--load_pretrain", type=str, default="")
        p.add_argument("--param_key_map", type=_param_key_map, default={})
        p.add_argument("--which_epoch", type=str, default="latest")
        p.add_argument("--phase", type=str, default="train")
        p.add_argument("--niter", type=int, default=100)
        p.add_argument("--niter_decay", type=int, default=100)
        p.add_argument("--niter_limit_aux", type=int, default=20)
        p.add_argument("--beta1", type=float, default=0.5)
        p.add_argument("--lr", type=float, default=0.0002)
        p.add_argument("--validation_split", type=float, default=0.05)
        p.add_argument("--val_indices", type=str)
        p.add_argument("--eval_size", type=int, default=100)
        p.add_argument("--phase_encoding_mode", type=str, default=None)

        # discriminators (train_options.py:41-48)
        p.add_argument("--num_D", type=int, default=2)
        p.add_argument("--n_layers_D", type=int, default=3)
        p.add_argument("--ndf", type=int, default=64)
        p.add_argument("--no_ganFeat_loss", action="store_true")
        p.add_argument("--lambda_feat", type=float, default=10.0)
        p.add_argument("--no_lsgan", action="store_true")
        p.add_argument("--pool_size", type=int, default=0)

        # TPU-native additions (no reference equivalent — SURVEY.md §5.1
        # records the reference has no profiler; these are additive flags)
        p.add_argument("--profile_dir", type=str, default="",
                       help="write a jax.profiler trace here")
        p.add_argument("--profile_step", type=int, default=8,
                       help="global step to start the trace at")
        p.add_argument("--profile_nsteps", type=int, default=4,
                       help="number of steps to trace")
        p.add_argument("--multihost", action="store_true",
                       help="jax.distributed multi-host (DCN) training")
        p.add_argument("--accum_steps", type=int, default=1,
                       help="gradient accumulation: average grads over k "
                            "micro-batches, apply Adam every k-th step")
        p.add_argument("--export_path", type=str, default="",
                       help="export_cli: output StableHLO artifact path")
        p.add_argument("--export_batch", type=int, default=8,
                       help="export_cli: baked segment-batch size")
        p.add_argument("--export_platforms", type=str, default="tpu",
                       help="export_cli: comma-separated lowering platforms")
        p.add_argument("--jax_cache_dir", type=str,
                       default=os.path.expanduser("~/.cache/mdctgan_tpu_xla"),
                       help="persistent XLA compilation cache ('' disables)")
        p.add_argument("--coordinator_address", type=str, default="",
                       help="coordinator host:port for --multihost")
        p.add_argument("--deterministic_eval", action="store_true",
                       help="eval on files in order with FIXED per-file crop "
                            "offsets: two evals at the same step produce "
                            "identical eval.csv rows (default: reference-"
                            "parity random crops)")

        # STFT params (train_options.py:63-73)
        p.add_argument("--lr_sampling_rate", type=int, default=LR_SAMPLE_RATE)
        p.add_argument("--hr_sampling_rate", type=int, default=HR_SAMPLE_RATE)
        p.add_argument("--sr_sampling_rate", type=int, default=SR_SAMPLE_RATE)
        p.add_argument("--segment_length", type=int, default=FRAME_LENGTH)
        p.add_argument("--gen_overlap", type=int, default=0)
        p.add_argument("--n_fft", type=int, default=N_FFT)
        p.add_argument("--bins", type=int, default=BINS)
        p.add_argument("--hop_length", type=int, default=HOP_LENGTH)
        p.add_argument("--win_length", type=int, default=WIN_LENGTH)
        p.add_argument("--center", action="store_true")
        p.add_argument("--is_lr_input", action="store_true")
        self.isTrain = True


class TestOptions(BaseOptions):
    def initialize(self):
        BaseOptions.initialize(self)
        p = self.parser
        # test_options.py:6-16 (ONNX/TRT flags parsed-but-unused, like ref)
        p.add_argument("--ntest", type=float, default=float("inf"))
        p.add_argument("--results_dir", type=str, default="./results/")
        p.add_argument("--aspect_ratio", type=float, default=1.0)
        p.add_argument("--phase", type=str, default="test")
        p.add_argument("--which_epoch", type=str, default="latest")
        p.add_argument("--how_many", type=int, default=50)
        p.add_argument("--cluster_path", type=str, default="features_clustered_010.npy")
        p.add_argument("--use_encoded_image", action="store_true")
        p.add_argument("--export_onnx", type=str)
        p.add_argument("--engine", type=str)
        p.add_argument("--onnx", type=str)
        self.isTrain = False


def spectral_config_from_opt(opt):
    """Parsed options -> SpectralConfig (the glue the reference does by
    splatting all opt attrs onto Audio2MDCT, pix2pixHD_model.py:17-19)."""
    from mdctgan_tpu.ops.features import SpectralConfig

    return SpectralConfig(
        n_fft=opt.n_fft,
        hop_length=opt.hop_length,
        win_length=opt.win_length,
        center=bool(getattr(opt, "center", True)),
        lr_sampling_rate=opt.lr_sampling_rate,
        hr_sampling_rate=opt.hr_sampling_rate,
        sr_sampling_rate=opt.sr_sampling_rate,
        segment_length=opt.segment_length,
        arcsinh_transform=opt.arcsinh_transform,
        arcsinh_gain=opt.arcsinh_gain,
        explicit_encoding=opt.explicit_encoding,
        alpha=opt.alpha,
        raw_mdct=opt.raw_mdct,
        abs_norm=opt.abs_norm,
        src_range=tuple(opt.src_range),
        norm_range=tuple(opt.norm_range),
        min_value=opt.min_value,
        mask=opt.mask,
        mask_hr=opt.mask_hr,
        fit_residual=opt.fit_residual,
        abs_spectro=bool(getattr(opt, "abs_spectro", False)),
    )


def use_fused_from_opt(opt):
    """--fused_mdct flag -> SpectralTransform(use_fused=...) argument."""
    return {"auto": None, "on": True, "off": False}[
        getattr(opt, "fused_mdct", "auto")
    ]
