#!/bin/bash
# Canonical flagship training config (reference train.sh:3-17): VCTK 16->48 kHz,
# batch 20, bf16, arcsinh gain 1000, netG local / ngf 56 / 3 downsamples /
# 4 resblocks + 3 attention blocks (6 heads x 128), fit_residual,
# interpolate-up + resconv-down, num_D 3, 60+60 epochs.
#
# Throughput note (docs/PERFORMANCE.md): on a v5e chip `--batchSize 40
# --lr 2.1e-4` raises per-sample throughput ~19% at reference-class LSD
# (full-schedule convergence + serve loop validated; sqrt-scale the lr with
# the batch); batch 20 is kept here for reference-protocol parity.
# Perf-form selectors --upsample_method/--head_phases default to the
# measured-fastest (dilated + 4x8) — only override to re-A/B on new hardware.

python train.py \
    --name your_training_name \
    --dataroot ./datasets/vctk/train.csv --evalroot ./datasets/vctk/test.csv \
    --lr_sampling_rate 16000 --sr_sampling_rate 48000 \
    --batchSize 20 \
    --fp16 --nThreads 16 --lr 1.5e-4 \
    --arcsinh_transform --abs_spectro --arcsinh_gain 1000 --center \
    --norm_range -1 1 --smooth 0.0 --abs_norm --src_range -5 5 \
    --netG local --ngf 56 \
    --n_downsample_global 3 --n_blocks_global 4 \
    --n_blocks_attn_g 3 --dim_head_g 128 --heads_g 6 --proj_factor_g 4 \
    --n_blocks_attn_l 0 --n_blocks_local 3 \
    --fit_residual --upsample_type interpolate --downsample_type resconv \
    --niter 60 --niter_decay 60 --num_D 3 \
    --eval_freq 32000 --save_latest_freq 16000 --save_epoch_freq 10 --display_freq 16000 --tf_log
