"""Regression tests for scripts/lib_lock.sh (mkdir-based chain locking).

flock(2) does not enforce across processes on this image's filesystem —
a child re-opening the lock file successfully took a lock its parent
held — so the operational chain scripts use atomic-mkdir locks with
stale-pid stealing. These tests drive the shell functions for real.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "scripts", "lib_lock.sh")


def sh(script: str) -> subprocess.CompletedProcess:
    return subprocess.run(["bash", "-c", script], capture_output=True,
                          text=True, timeout=60)


def test_second_acquire_refused_while_owner_alive(tmp_path):
    lock = tmp_path / "l.d"
    r = sh(f"""
. {LIB}
( . {LIB}; acquire_lock {lock} && sleep 3 ) &
holder=$!
sleep 0.5
if acquire_lock {lock}; then echo GOT; else echo REFUSED; fi
kill $holder 2>/dev/null
""")
    assert "REFUSED" in r.stdout, r.stdout + r.stderr


def test_lock_released_on_exit(tmp_path):
    lock = tmp_path / "l.d"
    r = sh(f"""
bash -c '. {LIB}; acquire_lock {lock} && true'
. {LIB}
if acquire_lock {lock}; then echo REACQUIRED; else echo STUCK; fi
""")
    assert "REACQUIRED" in r.stdout, r.stdout + r.stderr


def test_stale_lock_stolen(tmp_path):
    lock = tmp_path / "l.d"
    lock.mkdir()
    (lock / "pid").write_text("999999")  # dead pid
    r = sh(f". {LIB}; if acquire_lock {lock}; then echo STOLEN; fi")
    assert "STOLEN" in r.stdout, r.stdout + r.stderr


def test_retry_train_refuses_held_ckpt_dir(tmp_path):
    ck = tmp_path / "ck"
    log = tmp_path / "log"
    r = sh(f"""
cd {REPO}
( . {LIB}; acquire_lock {ck}.lock.d && sleep 3 ) &
holder=$!
sleep 0.5
bash scripts/retry_train.sh configs/smoke_ae.yaml {ck} {log}; echo rc=$?
kill $holder 2>/dev/null
""")
    assert "rc=1" in r.stdout
    assert "refusing" in (log.read_text() if log.exists() else "")
