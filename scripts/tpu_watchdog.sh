#!/bin/bash
# Wedge watchdog for long TPU runs through the axon tunnel.
#
# The tunnel session can wedge spontaneously (~once per 30-60 min of
# training, CLAUDE.md "Tunnel session wedge CAN BE SPONTANEOUS"): all
# trainer threads park in futex/ep_poll, io goes flat, no step progress.
# The only recovery is SIGKILL + checkpoint-resume, which the
# run_accuracy_*.sh restart wrappers perform automatically — but only
# once the wedged process dies.  This watchdog closes the loop: if the
# trainer's stdout log goes silent for longer than STALE_S (normal
# skip-print cadence is seconds; a cached-compile resume prints within
# ~3 min; only a FIRST remote compile can be silent ~10 min), it
# SIGKILLs the trainer child.  The pid is derived by walking ppid from
# the wrapper pid and verified against /proc/<pid>/cmdline — never by
# pattern matching.
#
# Usage: scripts/tpu_watchdog.sh <wrapper_pid_file> <train_log> [stale_s]
set -u
PID_FILE=${1:?wrapper pid file}
LOG=${2:?trainer stdout log}
# Default stays ABOVE the worst-case first-compile silence (~12 min,
# CLAUDE.md): a shorter threshold on a cold compilation cache would kill
# the trainer mid-compile every cycle, and since a killed compile never
# populates the cache the loop would never terminate.
STALE_S=${3:-780}
WRAPPER_PID=$(cat "$PID_FILE")
while kill -0 "$WRAPPER_PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALE_S" ]; then
        # the wrapper also spawns sleep/ps children: scan ALL children
        # and kill the one whose cmdline is the trainer, never head -1
        for child in $(ps -o pid= --ppid "$WRAPPER_PID"); do
            if grep -q train_flownet "/proc/$child/cmdline" 2>/dev/null
            then
                echo "$(date) watchdog: $LOG stale $((now - mt))s," \
                     "killing trainer $child" >&2
                kill -9 "$child"
                sleep 30
                break
            fi
        done
    fi
done
