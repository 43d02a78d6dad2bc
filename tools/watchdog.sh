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
PIDDIR="$(cd "$(dirname "$0")/.." && pwd)/.watchdog"

if [ "${1:-}" = "--kill-stale" ]; then
  shopt -s nullglob
  for f in "$PIDDIR"/*.pid; do
    read -r WPID CPID < "$f" || true
    for P in ${CPID:-} ${WPID:-}; do
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
  while kill -0 "$PID" 2>/dev/null; do
    T0=$(ps -o time= -p "$PID" 2>/dev/null | tr -d ' ')
    S0=$(stat -c %s "$LOG")
    sleep "$STALL"
    kill -0 "$PID" 2>/dev/null || break
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
