#!/usr/bin/env bash
# Cluster training launcher — the TPU-pod equivalent of the reference's SLURM
# script (run.sh: 1 node, exclusive, singularity + srun). On Cloud TPU the
# scheduler is replaced by per-worker SSH fan-out; JAX's multi-host runtime
# discovers peers via the TPU metadata service (jax.distributed.initialize
# needs no arguments on TPU VMs).
#
# Pod data feeding: with jax.process_count() > 1 every worker loads only its
# stride-slice of the BIDS sample lists (DataConfig.process_split, on by
# default) and batch_size is per-process; parallel/mesh.py::shard_batch
# assembles the per-worker batches into globally-sharded arrays via
# jax.make_array_from_process_local_data — no worker ever holds the global
# batch.
#
# Usage:
#   ./scripts/run_train.sh BIDS_DIR [extra train.py args...]
# Env:
#   TPU_NAME    (for gcloud fan-out on a pod; unset = run locally)
#   ZONE        GCE zone for the pod
#   CONFIG      JSON config path (optional)
#   WATCHDOG_STALL      seconds; when set, supervise the local run with
#                       scripts/train_watchdog.py (kills + auto-resumes a
#                       wedged process — see utils/watchdog.py) and resume
#                       from the newest checkpoint via --ckpt auto
#   WATCHDOG_HEARTBEAT  heartbeat path (default: logs/ — TrainConfig.log_dir;
#                       metrics.csv there is rewritten every epoch)
set -euo pipefail

BIDS_DIR=${1:?usage: run_train.sh BIDS_DIR [args...]}
shift || true
REPO=$(cd "$(dirname "$0")/.." && pwd)
ARGS=("$BIDS_DIR" "$@")
[ -n "${CONFIG:-}" ] && ARGS+=(--config "$CONFIG")

export OMP_NUM_THREADS=1   # host threads belong to the input pipeline

if [ -n "${TPU_NAME:-}" ]; then
  # Fan out to every worker of the pod slice; each runs the same SPMD program
  # (jax initializes the global mesh across workers). %q-quote every arg so
  # paths with spaces survive the ssh command string.
  printf -v QUOTED_ARGS '%q ' "${ARGS[@]}"
  gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
    ${ZONE:+--zone "$ZONE"} --worker=all \
    --command "cd $REPO && PYTHONPATH=$REPO python3 src/train.py $QUOTED_ARGS"
elif [ -n "${WATCHDOG_STALL:-}" ]; then
  # Hang-proof local run: a wedged tunnel/device RPC blocks forever and is
  # uninterruptible from inside the process; the watchdog restarts from the
  # newest complete checkpoint. --ckpt auto makes the argv re-runnable.
  case " ${ARGS[*]} " in
    *" --ckpt "*) ;;
    *) ARGS+=(--ckpt auto) ;;
  esac
  PYTHONPATH="$REPO" python3 "$REPO/scripts/train_watchdog.py" \
    --stall-seconds "$WATCHDOG_STALL" \
    --heartbeat "${WATCHDOG_HEARTBEAT:-logs}" -- \
    python3 "$REPO/src/train.py" "${ARGS[@]}"
else
  # No cd: a relative BIDS_DIR must resolve against the caller's cwd.
  PYTHONPATH="$REPO" python3 "$REPO/src/train.py" "${ARGS[@]}"
fi
