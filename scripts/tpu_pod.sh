#!/usr/bin/env bash
# TPU pod helper — create / sync / run / kill / prepare / check / logs across
# projects and zones, plus an interactive menu.
#
# Capability parity with the reference's tpu_command.sh (6.5k-line interactive
# menu: ssh / sync dir / kill job / prepare env / check TPU / rm logs across
# projects+zones) and scripts/openvms/create_tpu_vm.sh (spot create with
# infinite retry), reorganized as subcommands so it is scriptable AND
# interactive (`tpu_pod.sh menu`).
#
# Environment (all overridable):
#   TPU_NAME   pod name                      (default openvision-pod)
#   ZONE       gcp zone                      (default us-central2-b)
#   PROJECT    gcp project                   (default: gcloud config)
#   ACCEL      accelerator type              (default v5litepod-128)
#   RUNTIME    tpu vm runtime version        (default v2-alpha-tpuv5-lite)
#   WORKER     worker selector for ssh/run   (default all)
set -euo pipefail

CMD="${1:-help}"; shift || true
: "${TPU_NAME:=openvision-pod}"
: "${ZONE:=us-central2-b}"
: "${PROJECT:=$(gcloud config get-value project 2>/dev/null || echo '')}"
: "${ACCEL:=v5litepod-128}"
: "${RUNTIME:=v2-alpha-tpuv5-lite}"
: "${WORKER:=all}"

gc() { gcloud compute tpus tpu-vm "$@" --zone="$ZONE" --project="$PROJECT"; }

do_create() {
  # spot-create with infinite retry (preemptible capacity appears in waves;
  # reference create_tpu_vm.sh:16-27)
  until gc create "$TPU_NAME" \
      --accelerator-type="$ACCEL" --version="$RUNTIME" --spot; do
    echo "create failed; retrying in 30s..."; sleep 30
  done
}

do_list() {
  # every TPU across the configured project's common zones
  for z in ${ZONES:-us-central1-a us-central2-b us-east1-d us-east5-a europe-west4-b}; do
    echo "== $PROJECT / $z"
    gcloud compute tpus tpu-vm list --zone="$z" --project="$PROJECT" 2>/dev/null || true
  done
}

do_describe() { gc describe "$TPU_NAME"; }

do_sync() {
  # rsync the repo to every worker (scp --recurse, like reference "sync dir")
  gc scp --recurse --worker=all \
    "$(git rev-parse --show-toplevel)" "$TPU_NAME":~/openvision_tpu
}

do_prepare() {
  # run the env setup on every worker (reference "prepare env")
  gc ssh "$TPU_NAME" --worker=all \
    --command="cd ~/openvision_tpu && bash scripts/setup.sh ${1:-stable}"
}

do_run() {
  gc ssh "$TPU_NAME" --worker="$WORKER" \
    --command="cd ~/openvision_tpu && $*"
}

do_ssh() { gc ssh "$TPU_NAME" --worker="${1:-0}"; }

do_kill() {
  # kill the training job on every worker (reference "kill job"); targets the
  # exact module invocation, then frees any stuck libtpu lockfile.
  gc ssh "$TPU_NAME" --worker=all --command="
    pkill -f openvision_tpu.train.trainer || true
    sudo rm -f /tmp/libtpu_lockfile || true"
}

do_check() {
  # device visibility + per-worker health (reference "check TPU")
  gc ssh "$TPU_NAME" --worker=all --command="
    hostname
    python3 -c 'import jax; print(jax.process_index(), jax.local_device_count(), jax.devices()[:1])' \
      2>/dev/null || echo 'JAX NOT READY'"
}

do_rmlogs() {
  # clear TPU runtime logs eating the boot disk (reference "rm tpu logs")
  gc ssh "$TPU_NAME" --worker=all --command="
    sudo rm -rf /tmp/tpu_logs/* ~/openvision_tpu/wandb 2>/dev/null || true
    df -h / | tail -1"
}

do_delete() { gc delete "$TPU_NAME" --quiet; }

do_menu() {
  PS3="tpu_pod> "
  select opt in \
      "list TPUs (all zones)" "describe $TPU_NAME" "create (spot, retry)" \
      "sync repo" "prepare env" "run command" "ssh worker 0" \
      "check health" "kill job" "rm logs" "delete" "quit"; do
    case "$REPLY" in
      1) do_list ;;
      2) do_describe ;;
      3) do_create ;;
      4) do_sync ;;
      5) do_prepare ;;
      6) read -r -p "command: " c; do_run "$c" ;;
      7) do_ssh 0 ;;
      8) do_check ;;
      9) do_kill ;;
      10) do_rmlogs ;;
      11) do_delete ;;
      12) break ;;
      *) echo "?" ;;
    esac
  done
}

case "$CMD" in
  create)   do_create ;;
  list)     do_list ;;
  describe) do_describe ;;
  sync)     do_sync ;;
  prepare)  do_prepare "$@" ;;
  run)      do_run "$@" ;;
  ssh)      do_ssh "$@" ;;
  kill)     do_kill ;;
  check)    do_check ;;
  rmlogs)   do_rmlogs ;;
  delete)   do_delete ;;
  menu)     do_menu ;;
  *)
    echo "usage: $0 {create|list|describe|sync|prepare [mode]|run <cmd>|ssh [worker]|kill|check|rmlogs|delete|menu}"
    exit 1;;
esac
