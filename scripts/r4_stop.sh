#!/bin/bash
# Cleanly stop the round-4 tunnel watcher and any queue leg it is running,
# so the TPU is single-tenant again (CLAUDE.md rule 2) before the driver's
# end-of-round bench.py fires. Must be run BEFORE the session ends if the
# queue is still active.
#
# Rules honored:
# - No pattern kills (pkill/pgrep -f): we walk the watcher's process tree
#   from the tracked pid in /tmp/r4_watch.pid via `ps --ppid`.
# - SIGTERM only, deepest-first: the train loop checkpoints-and-exits on
#   SIGTERM, and SIGKILL on a TPU-holding process wedges the lease for
#   ~10-15 min (rule 3) — exactly what we must avoid right before the
#   driver bench.
set -u
PIDFILE=${PIDFILE:-/tmp/r4_watch.pid}

descendants() { # echo all descendant pids of $1, children before parents? No:
  # emit depth-first so leaves (the python measurement process) come FIRST.
  local pid kids
  kids=$(ps -o pid= --ppid "$1" 2>/dev/null)
  for pid in $kids; do
    descendants "$pid"
    echo "$pid"
  done
}

if [ ! -f "$PIDFILE" ]; then
  echo "no $PIDFILE — watcher not started this session; nothing to stop"
  exit 0
fi
WPID=$(cat "$PIDFILE")
if ! kill -0 "$WPID" 2>/dev/null; then
  echo "watcher pid $WPID already gone; nothing to stop"
  exit 0
fi

# Stop the watcher FIRST so it cannot launch the next leg while we are
# terminating the current one, then take down its tree leaves-first.
TREE=$(descendants "$WPID")
echo "stopping watcher $WPID and descendants:" $TREE
kill -TERM "$WPID" 2>/dev/null
for pid in $TREE; do
  kill -TERM "$pid" 2>/dev/null && echo "  SIGTERM -> $pid"
done

# Wait for the tree to drain (a mid-checkpoint train loop may take ~30 s;
# a wedged-tunnel python may take its own timeout to notice — cap at 120 s,
# then report what is left rather than escalating to SIGKILL).
deadline=$(( $(date +%s) + 120 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  alive=""
  for pid in $WPID $TREE; do
    kill -0 "$pid" 2>/dev/null && alive="$alive $pid"
  done
  [ -z "$alive" ] && { echo "queue fully stopped; TPU free"; exit 0; }
  sleep 5
done
echo "WARNING: still alive after 120s:$alive"
echo "NOT escalating to SIGKILL (rule 3: wedges the TPU lease)."
echo "Re-run this script, or wait for the leg's own timeout to expire."
exit 1
