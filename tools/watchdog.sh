#!/bin/bash
# Wedge-tolerant runner for RESUMABLE TPU jobs.
#
# The axon tunnel can wedge spontaneously mid-run (CLAUDE.md): the
# process stops accruing CPU and stops logging, forever.  The only cure
# is kill-by-PID and relaunch; tools like rd_sweep_proof.py checkpoint
# every 1000 steps and resume from the latest iter_N.ckpt, so a relaunch
# loses bounded work.  This wrapper automates the babysitting:
#
#   watchdog.sh LOG STALL_SECS MAX_RESTARTS CMD ARGS...
#   watchdog.sh --kill-stale        # kill (BY PID) every watchdog +
#                                   # child recorded in .watchdog/*.pid
#
# Every run writes .watchdog/<name>.pid ("watchdog_pid child_pid") next
# to this script's repo root and removes it on exit, so a later session
# (or bench.py's pre-flight) can find stale runs without pattern-
# matching process lists.  A nohup'd watchdog SURVIVES session restarts
# — run --kill-stale before launching any new TPU job (CLAUDE.md
# one-client rule).
#
# A stall = no CPU-time accrual AND no log growth across one STALL_SECS
# window.  Remote compiles accrue no CPU and print nothing for up to
# ~10-15 min (measured: mask init_state 317 s, RGB longer), so keep
# STALL_SECS comfortably above that (default use: 1500).  Exit 0 when
# CMD exits 0; relaunch (resume) on kill or nonzero exit, up to
# MAX_RESTARTS times.  Kills are BY PID only (never by pattern).
set -u
# WATCHDOG_PIDDIR override: tests exercise kill-stale in an isolated
# dir so a pytest run never kills a live watchdogged TPU job
PIDDIR="${WATCHDOG_PIDDIR:-$(cd "$(dirname "$0")/.." && pwd)/.watchdog}"

if [ "${1:-}" = "--kill-stale" ]; then
  shopt -s nullglob
  for f in "$PIDDIR"/*.pid; do
    read -r WPID CPID < "$f" || true
    # watchdog FIRST: killing the child first gives the watchdog a
    # window to relaunch it (child-exit -> sleep 10 -> resume)
    for P in ${WPID:-} ${CPID:-}; do
      if kill -0 "$P" 2>/dev/null; then
        echo "killing stale pid $P (from $f)"
        kill "$P" 2>/dev/null; sleep 2; kill -9 "$P" 2>/dev/null
      fi
    done
    rm -f "$f"
  done
  exit 0
fi

LOG=$1; STALL=$2; MAXR=$3; shift 3
mkdir -p "$PIDDIR"
PIDFILE="$PIDDIR/$(basename "$LOG" .log).$$.pid"
trap 'rm -f "$PIDFILE"' EXIT
restarts=0
touch "$LOG"
while :; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$$ $PID" > "$PIDFILE"
  echo "[watchdog $(date +%H:%M:%S)] launched pid $PID (restart $restarts)" >> "$LOG"
  # running = alive AND not a zombie: the child is OUR child, so after
  # it exits kill -0 keeps succeeding on the zombie until we wait() —
  # without the state check a finished run sits a full STALL window
  running() {
    kill -0 "$1" 2>/dev/null || return 1
    [ "$(sed 's/.*) //' "/proc/$1/stat" 2>/dev/null | cut -d' ' -f1)" != Z ]
  }
  while running "$PID"; do
    T0=$(ps -o time= -p "$PID" 2>/dev/null | tr -d ' ')
    S0=$(stat -c %s "$LOG")
    slept=0  # STALL sliced into 5 s polls: child exit is seen promptly
    while [ "$slept" -lt "$STALL" ] && running "$PID"; do
      sleep 5; slept=$((slept + 5))
    done
    running "$PID" || break
    T1=$(ps -o time= -p "$PID" 2>/dev/null | tr -d ' ')
    S1=$(stat -c %s "$LOG")
    if [ "$T0" = "$T1" ] && [ "$S0" = "$S1" ]; then
      echo "[watchdog $(date +%H:%M:%S)] stall: no CPU/log progress in ${STALL}s - killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "[watchdog $(date +%H:%M:%S)] done rc=0" >> "$LOG"
    exit 0
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -ge "$MAXR" ]; then
    echo "[watchdog $(date +%H:%M:%S)] giving up after $restarts restarts (rc=$RC)" >> "$LOG"
    exit 1
  fi
  echo "[watchdog $(date +%H:%M:%S)] child rc=$RC - relaunching (resume)" >> "$LOG"
  sleep 10
done
