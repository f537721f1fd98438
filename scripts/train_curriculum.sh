#!/usr/bin/env bash
# Three-stage OpenVision training curriculum on a TPU pod.
# Capability parity with reference scripts/project/openvision/train.sh:
# pretrain at low resolution, finetune at 224, finetune at high resolution,
# each stage resuming the previous stage's checkpoint via ft_from.
set -euo pipefail

: "${WORKDIR:?set WORKDIR (e.g. gs://bucket/run or /data/run)}"
IMG="${IMG:-L/14}"
TXT="${TXT:-L}"
DECODER="${DECODER:-L}"
BATCH_FACTOR="${BATCH_FACTOR:-2}"       # global batch = 16384 * factor
FT_BATCH_FACTOR="${FT_BATCH_FACTOR:-2}"
PRE_RES="${PRE_RES:-84}"
FT_RES="${FT_RES:-224}"
HI_RES="${HI_RES:-336}"
DATA_PARALLEL="${DATA_PARALLEL:--1}"
FSDP="${FSDP:-2}"
TENSOR="${TENSOR:-1}"
REMAT="${REMAT:-full}"
DTYPE="${DTYPE:-bfloat16}"              # bf16 compute, f32 params
# "auto" resolves the image-tower attention per stage: xla at 84/224px,
# fused Pallas blocks at >=336px (577+ tokens, +19% train step vs xla —
# docs/PERF_NOTES.md "Long-sequence training ladder").
ATTN="${ATTN:-auto}"
# Caption-decoder fusion style. cross_attn trains +14-18% faster with
# identical quality (docs/PERF_NOTES.md round 4) and is the default for NEW
# runs here; set DEC_FUSION=concat when fine-tuning from a released
# reference checkpoint (concat is the reference tree layout — fusion style
# changes the param tree, configs/openvision.py `dec_fusion`).
DEC_FUSION="${DEC_FUSION:-cross_attn}"

CFG=openvision_tpu/configs/openvision.py
COMMON="img=${IMG},txt_name=${TXT},txt_decoder_name=${DECODER},remat=${REMAT},dtype=${DTYPE},attn_impl=${ATTN},dec_fusion=${DEC_FUSION},data_parallelism=${DATA_PARALLEL},fsdp_parallelism=${FSDP},tensor_parallelism=${TENSOR}"

run() { python -m openvision_tpu.train.trainer "$@"; }

# ---- stage 1: pretrain @ PRE_RES ----
run --config "${CFG}:res=${PRE_RES},batch_factor=${BATCH_FACTOR},base_lr=8e-6,imagenet_epoch=10000,vitual_warmup_epoch=40,${COMMON}" \
    --workdir "${WORKDIR}/pretrain_${PRE_RES}"

# ---- stage 2: finetune @ FT_RES ----
run --config "${CFG}:res=${FT_RES},batch_factor=${FT_BATCH_FACTOR},base_lr=4e-7,imagenet_epoch=800,vitual_warmup_epoch=8,${COMMON}" \
    --workdir "${WORKDIR}/ft_${FT_RES}" \
    --override "ft_from=${WORKDIR}/pretrain_${PRE_RES}/checkpoints"

# ---- stage 3: finetune @ HI_RES (smaller batch) ----
run --config "${CFG}:res=${HI_RES},batch_factor=0.5,base_lr=1e-7,imagenet_epoch=200,vitual_warmup_epoch=2,${COMMON}" \
    --workdir "${WORKDIR}/ft_${HI_RES}" \
    --override "load_transform=${WORKDIR}/ft_${FT_RES}/checkpoints"
