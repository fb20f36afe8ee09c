"""Stall watchdog (utils/watchdog.py): the outside-the-process recovery
path for wedged device RPCs (a tunneled TPU client blocked in a dead RPC
cannot be interrupted from inside — observed live 2026-08-19, see the
module docstring). The reference has no equivalent; its only recourse is
the SLURM wall-time limit (/root/reference/scripts/run_train.sh)."""

import os
import subprocess
import sys
import textwrap
import time

from unet_bssfp_tpu.utils.watchdog import (
    WatchdogResult,
    newest_mtime,
    run_with_watchdog,
)

QUIET = lambda *a: None  # noqa: E731


def _child(tmp_path, body: str) -> list:
    """A tiny supervised program: attempt counting + heartbeat helpers.

    /bin/sh, not python: interpreter startup measured 7.5 s under suite
    contention, which would outlast any reasonable test stall window."""
    script = tmp_path / "child.sh"
    script.write_text(textwrap.dedent(f"""\
        d={str(tmp_path)!r}
        cnt=$d/attempts
        if [ -f "$cnt" ]; then n=$(($(cat "$cnt")+1)); else n=1; fi
        printf %s $n > "$cnt"
        hb=$d/heartbeat
        {body}
    """))
    return ["/bin/sh", str(script)]


def test_newest_mtime_walks_dirs(tmp_path):
    assert newest_mtime([str(tmp_path / "missing")]) is None
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    f = sub / "metrics.csv"
    f.write_text("epoch\n")
    past = time.time() - 1000
    os.utime(f, (past, past))
    os.utime(sub, (past, past))
    os.utime(sub.parent, (past, past))
    os.utime(tmp_path, (past, past))
    got = newest_mtime([str(tmp_path)])
    assert got is not None and abs(got - past) < 5
    f.write_text("epoch\n0\n")  # fresh epoch row moves the heartbeat
    assert newest_mtime([str(tmp_path)]) > past + 500


def test_stall_kill_and_resume(tmp_path):
    # Attempt 1 beats the heart once then wedges (sleeps forever, like a
    # dead tunnel RPC); attempt 2 finishes cleanly — i.e. the `--resume
    # auto` contract: re-running the same argv continues the run.
    cmd = _child(tmp_path, """
        printf %s $n > "$hb"
        if [ $n -eq 1 ]; then sleep 600; fi
        exit 0
    """)
    res = run_with_watchdog(
        cmd, [str(tmp_path / "heartbeat")], stall_seconds=4.0,
        max_restarts=2, poll_seconds=0.3, grace_seconds=1.0, log=QUIET,
    )
    assert isinstance(res, WatchdogResult)
    assert res.exit_code == 0
    assert res.restarts == 1
    assert (tmp_path / "attempts").read_text() == "2"


def test_crash_propagates_without_restart(tmp_path):
    cmd = _child(tmp_path, """
        printf %s $n > "$hb"
        exit 7
    """)
    res = run_with_watchdog(
        cmd, [str(tmp_path / "heartbeat")], stall_seconds=30,
        max_restarts=3, poll_seconds=0.1, log=QUIET,
    )
    assert res.exit_code == 7
    assert res.restarts == 0
    assert (tmp_path / "attempts").read_text() == "1"


def test_restart_budget_exhausted(tmp_path):
    # Every incarnation wedges immediately (never beats the heart):
    # stall clock falls back to process start; budget of 1 restart ends
    # supervision with a nonzero code.
    cmd = _child(tmp_path, """
        sleep 600
    """)
    res = run_with_watchdog(
        cmd, [str(tmp_path / "heartbeat")], stall_seconds=4.0,
        max_restarts=1, poll_seconds=0.3, grace_seconds=1.0, log=QUIET,
    )
    assert res.exit_code != 0
    assert res.restarts == 1
    assert res.stalled
    assert (tmp_path / "attempts").read_text() == "2"


def test_quality_record_auto_resume_discovery(tmp_path):
    # --resume auto resolves the newest complete checkpoint (ignoring
    # orbax tmp dirs) and splices every prior metrics segment.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "qr", os.path.join(os.path.dirname(__file__), os.pardir,
                           "scripts", "quality_record.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)

    wd = tmp_path / "run"
    run = wd / "ckpts" / "m-20260819-1"
    (run / "7").mkdir(parents=True)
    (run / "12").mkdir()
    (run / "13.orbax-checkpoint-tmp").mkdir()
    for i, rows in enumerate((["epoch,x", "0,1", "1,2"], ["epoch,x", "0,3"])):
        seg = wd / "logs" / f"m-20260819-{i}"
        seg.mkdir(parents=True)
        (seg / "metrics.csv").write_text("\n".join(rows) + "\n")

    class A:
        workdir = str(wd)
        resume = "auto"
        prior_metrics = None

    qr.resolve_auto_resume(A)
    assert A.resume == str(run / "12")
    combined = open(A.prior_metrics).read().strip().splitlines()
    assert combined == ["epoch,x", "0,1", "1,2", "0,3"]

    # Empty workdir -> fresh run.
    class B:
        workdir = str(tmp_path / "fresh")
        resume = "auto"
        prior_metrics = None

    os.makedirs(B.workdir)
    qr.resolve_auto_resume(B)
    assert B.resume is None and B.prior_metrics is None


def test_cli_shim_help():
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                      "train_watchdog.py"), "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0
    assert "--stall-seconds" in out.stdout


def test_log_step_touches_heartbeat(tmp_path, monkeypatch):
    """The logger heartbeats at step granularity: a long epoch (or the
    first epoch's cache+compile preamble) must not read as a stall — the
    gap that loop-killed the round-5 saturation launch."""
    from unet_bssfp_tpu.train import logging as tlog
    from unet_bssfp_tpu.utils.watchdog import newest_mtime

    logger = tlog.MetricLogger(str(tmp_path / "run"))
    hb = tmp_path / "run" / "heartbeat"
    assert not hb.exists()
    logger.log_step({"train_gen_loss": 1.0})
    assert hb.exists()  # first step touches immediately
    first = hb.stat().st_mtime
    # Within the throttle window: no rewrite.
    logger.log_step({"train_gen_loss": 1.0})
    assert hb.stat().st_mtime == first
    # Past the throttle window: rewritten.
    logger._heartbeat_last -= tlog.HEARTBEAT_INTERVAL_S
    os.utime(hb, (first - 100, first - 100))
    logger.log_step({"train_gen_loss": 1.0})
    assert hb.stat().st_mtime > first - 100
    # The watchdog's recursive scan sees it.
    assert newest_mtime([str(tmp_path / "run")]) >= hb.stat().st_mtime
