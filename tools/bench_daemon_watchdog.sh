#!/bin/bash
# Keeps the bench warm-daemon alive: ping the socket every 5 min; on a dead
# or stale socket, restart BENCH_ROLE=daemon python bench.py (detached).
# Usage: setsid nohup tools/bench_daemon_watchdog.sh >/dev/null 2>&1 &
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SOCK="$REPO/.bench_daemon.sock"
while true; do
  ok=$(python - <<PY 2>/dev/null
import json, socket
c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
try:
    c.settimeout(10); c.connect("$SOCK")
    c.sendall(b'{"cmd": "ping"}\n')
    buf = b""
    while b"\n" not in buf:
        d = c.recv(4096)
        if not d: break
        buf += d
    print(1 if json.loads(buf.decode()).get("ready") else 0)
except Exception:
    print(0)
finally:
    c.close()
PY
)
  if [ "$ok" != "1" ]; then
    # a daemon that hasn't bound its socket yet may still be WARMING (cold
    # replica warmups have measured 900+ s) — only restart when the recorded
    # pid is actually gone, else we spawn duplicates and orphan the old one.
    # The daemon writes "$SOCK.pid" itself before warmup (bench.py
    # run_daemon), so the pid is the real python process, not a wrapper.
    if [ -f "$SOCK.pid" ] && kill -0 "$(cat "$SOCK.pid")" 2>/dev/null; then
      echo "$(date -Is) socket not ready but daemon pid alive; waiting" \
        >> "$REPO/.bench_daemon_watchdog.log"
    else
      echo "$(date -Is) daemon dead; restarting" >> "$REPO/.bench_daemon_watchdog.log"
      rm -f "$SOCK"
      cd "$REPO" && setsid nohup env BENCH_ROLE=daemon python bench.py \
        >> "$REPO/.bench_daemon.log" 2>&1 < /dev/null &
      sleep 600   # give the restart its warmup before re-probing
    fi
  fi
  sleep 300
done
