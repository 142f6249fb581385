"""Relay-window opportunism: capture on-chip measurements when the relay answers.

The axon tunnel relay answers in unpredictable windows (round 4: down the
entire session; round 5: answering with wedged-then-37 MB/s d2h).  This
tool is the automated arm of that opportunism: probe the relay, and when
it answers, run the on-chip capture set — link probe, the fetch-free
device-compute metric (tools/device_synth.py), and the device-path bench
configs — appending phase-stamped results to RELAY_CAPTURES.md (kept out
of NOTES.md so automation never rewrites the engineering log).

A negative probe appends one line to .relay_watch.log, so the round's
artifact either contains at least one automated on-chip capture or the
log proving the relay never answered (VERDICT r4 item 8).

Usage: python tools/relay_watch.py [--force]
Safe to run from cron: a lock file skips overlapping runs, every child is
timeout-bounded, and nothing here can hang on a dead relay (the probe is
a 3 s TCP connect).
"""

import datetime
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

LOCK = os.path.join(_REPO, ".relay_watch.lock")
LOG = os.path.join(_REPO, ".relay_watch.log")
OUT = os.path.join(_REPO, "RELAY_CAPTURES.md")


def _log(line):
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%SZ")
    with open(LOG, "a") as f:
        f.write(f"{stamp} {line}\n")
    print(line, flush=True)


def _run(name, args, timeout, env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(args, env=env, capture_output=True,
                              text=True, timeout=timeout)
        out = proc.stdout + proc.stderr
        rc = proc.returncode
    except subprocess.TimeoutExpired as e:
        out = "".join(
            s.decode(errors="replace") if isinstance(s, bytes) else (s or "")
            for s in (e.stdout, e.stderr)
        )
        rc = "timeout"
    dt = time.perf_counter() - t0
    keep = [ln for ln in out.splitlines()
            if ln.startswith("{") or ":" in ln[:40]]
    keep = [ln for ln in keep if "WARNING" not in ln][:40]
    return f"### {name} (rc={rc}, {dt:.0f}s)\n\n```\n" + "\n".join(keep) + "\n```\n"


def main():
    force = "--force" in sys.argv
    # overlap guard: a capture set takes up to ~35 min
    if os.path.exists(LOCK) and not force:
        age = time.time() - os.path.getmtime(LOCK)
        if age < 2700:
            _log(f"skipped: lock fresh ({age:.0f}s)")
            return
    from nvorbis_tpu.utils.relay import tpu_link_alive

    if not tpu_link_alive():
        _log("relay down (TCP probe refused)")
        return

    open(LOCK, "w").write(str(os.getpid()))
    try:
        _log("relay answering: starting capture set")
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%SZ")
        sections = [f"\n## Automated relay-window capture — {stamp}\n"]
        sections.append(_run(
            "link_probe", [sys.executable,
                           os.path.join(_REPO, "tools", "link_probe.py"),
                           "16"], 420))
        sections.append(_run(
            "device_synth (fetch-free)", [sys.executable,
                                          os.path.join(_REPO, "tools",
                                                       "device_synth.py"),
                                          "4", "8", "4"], 600))
        sections.append(_run(
            "bench device configs", [sys.executable,
                                     os.path.join(_REPO, "bench.py")],
            1500,
            {"NVT_BENCH_CONFIGS":
             "longform_batch_device,longform_batch_int16",
             "NVT_BENCH_BUDGET": "1400"}))
        if not os.path.exists(OUT):
            with open(OUT, "w") as f:
                f.write("# Relay-window captures (automated)\n\n"
                        "Appended by tools/relay_watch.py whenever the "
                        "tunnel relay answers its TCP probe.  Each capture "
                        "carries its own link-phase context.\n")
        with open(OUT, "a") as f:
            f.write("\n".join(sections))
        _log("capture set appended to RELAY_CAPTURES.md")
    finally:
        try:
            os.remove(LOCK)
        except OSError:
            pass


if __name__ == "__main__":
    main()
