#!/usr/bin/env bash
# TPU pod helper: create spot VMs (retry loop), sync code, run, kill jobs.
# Capability parity with reference tpu_command.sh + scripts/openvms/create_tpu_vm.sh.
set -euo pipefail

CMD="${1:-help}"; shift || true
: "${TPU_NAME:=openvision-pod}"
: "${ZONE:=us-central2-b}"
: "${PROJECT:=$(gcloud config get-value project 2>/dev/null || echo '')}"
: "${ACCEL:=v5litepod-128}"
: "${RUNTIME:=v2-alpha-tpuv5-lite}"

case "$CMD" in
  create)
    # spot-create with infinite retry (preemptible capacity appears in waves)
    until gcloud compute tpus tpu-vm create "$TPU_NAME" \
        --zone="$ZONE" --project="$PROJECT" \
        --accelerator-type="$ACCEL" --version="$RUNTIME" --spot; do
      echo "create failed; retrying in 30s..."; sleep 30
    done
    ;;
  sync)
    # rsync the repo to every worker
    gcloud compute tpus tpu-vm scp --recurse --worker=all \
      --zone="$ZONE" --project="$PROJECT" \
      "$(git rev-parse --show-toplevel)" "$TPU_NAME":~/openvision_tpu
    ;;
  run)
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
      --zone="$ZONE" --project="$PROJECT" \
      --command="cd ~/openvision_tpu && $*"
    ;;
  kill)
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
      --zone="$ZONE" --project="$PROJECT" \
      --command="pkill -f openvision_tpu.train.trainer || true"
    ;;
  check)
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=0 \
      --zone="$ZONE" --project="$PROJECT" \
      --command="python -c 'import jax; print(jax.devices())'"
    ;;
  delete)
    gcloud compute tpus tpu-vm delete "$TPU_NAME" --zone="$ZONE" --project="$PROJECT" --quiet
    ;;
  *)
    echo "usage: $0 {create|sync|run <cmd>|kill|check|delete}"; exit 1;;
esac
