"""tools/watchdog.sh contract tests (pure subprocess, no jax).

The watchdog is the TPU-job hygiene layer (VERDICT r3 item 4): every
long TPU run is wrapped in it, its pidfile is the ONLY sanctioned way a
later process (bench.py's pre-flight, a fresh session) may find and
kill a stale run — by recorded PID, never by pattern.
"""

import os
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WD = os.path.join(REPO, "tools", "watchdog.sh")


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def _wait(pred, secs=15.0):
    t0 = time.time()
    while time.time() - t0 < secs:
        if pred():
            return True
        time.sleep(0.2)
    return pred()


def test_kill_stale_kills_watchdog_then_child(tmp_path):
    # isolated pid dir: NEVER the repo's .watchdog — a pytest run must
    # not kill a live watchdogged TPU job (CLAUDE.md: pytest runs on CPU
    # alongside one TPU process)
    env = dict(os.environ, WATCHDOG_PIDDIR=str(tmp_path / "pids"))
    PIDDIR = str(tmp_path / "pids")
    log = tmp_path / "sleeper.log"
    proc = subprocess.Popen(
        ["bash", WD, str(log), "10000", "2", "sleep", "300"], env=env)
    try:
        # the run writes .watchdog/sleeper.<wd_pid>.pid = "wd_pid child"
        pidfile = [None]

        def find():
            for f in os.listdir(PIDDIR) if os.path.isdir(PIDDIR) else []:
                if f.startswith("sleeper."):
                    pidfile[0] = os.path.join(PIDDIR, f)
                    return True
            return False

        assert _wait(find), "watchdog never wrote its pidfile"
        wpid, cpid = map(int, open(pidfile[0]).read().split())
        assert _alive(wpid) and _alive(cpid)

        subprocess.run(["bash", WD, "--kill-stale"], check=True,
                       capture_output=True, env=env)
        assert _wait(lambda: not _alive(cpid)), "child survived kill-stale"
        # the watchdog is OUR Popen child: after SIGTERM it zombifies
        # until reaped, so poll() (which reaps) is the aliveness oracle
        assert _wait(lambda: proc.poll() is not None), "watchdog survived"
        # no relaunch: give a would-be resume (sleep 10 in the loop) time
        time.sleep(1.0)
        assert not os.path.exists(pidfile[0]), "pidfile not cleaned up"
        assert not find(), "watchdog relaunched the child after kill-stale"
    finally:
        proc.kill()
        proc.wait()


def test_watchdog_resumes_nonzero_exit_then_exits_clean(tmp_path):
    log = tmp_path / "flaky.log"
    state = tmp_path / "state"
    # isolated piddir: without it a timeout SIGKILL (which skips the EXIT
    # trap) would leave a stale pidfile in the repo's real .watchdog/
    # for a later bench pre-flight to act on (ADVICE r4)
    env = dict(os.environ, WATCHDOG_PIDDIR=str(tmp_path / "pids"))
    # fails on first launch, succeeds on second — models a wedged run
    # resumed from its checkpoint
    script = tmp_path / "flaky.sh"
    script.write_text(
        "#!/bin/bash\n"
        f"if [ -e {state} ]; then echo second-ok; exit 0; fi\n"
        f"touch {state}; echo first-fail; exit 3\n")
    script.chmod(0o755)
    rc = subprocess.run(
        ["bash", WD, str(log), "10000", "3", "bash", str(script)],
        timeout=60, env=env).returncode
    assert rc == 0
    text = log.read_text()
    assert "first-fail" in text and "second-ok" in text
    assert "rc=3 - relaunching" in text and "done rc=0" in text
