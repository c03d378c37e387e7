"""Job-layer parity units: ``job.log`` file routing and the ``verbose > 1``
email stats table (reference processor.py:478-482,735-755)."""

import sys

import stgx.cli as cli


def test_log_factory_routes_to_files(tmp_path):
    out = tmp_path / "run.out"
    err = tmp_path / "run.err"
    saved_stderr = sys.stderr
    # the redirect is idempotent: it only ever replaces the process's
    # original stderr (pytest's capture object would be left alone)
    sys.stderr = sys.__stderr__
    try:
        log = cli._log_factory({"log": [str(out), str(err)]})
        log("hello artifact")
        print("to stderr", file=sys.stderr, flush=True)
        log.restore()
        assert sys.stderr is sys.__stderr__
    finally:
        sys.stderr = saved_stderr
    assert "hello artifact" in out.read_text()
    assert "to stderr" in err.read_text()


def test_log_factory_defaults_to_stdout(capsys):
    log = cli._log_factory({"log": [None, None]})
    log("plain")
    assert "plain" in capsys.readouterr().out


def test_resume_preserves_curve_rows(tmp_path):
    """Resuming must extend — not truncate — the per-epoch curve CSVs."""
    rows = [
        [0, 1.0, 0.1, 2.0, 0.2, 0.3, 0.6, 0.2, 0.5, 9.0, 1.0],
        [1, 0.9, 0.1, 1.9, 0.2, 0.4, 0.7, 0.3, 0.6, 9.1, 1.1],
        [2, 0.8, 0.1, 1.8, 0.2, 0.5, 0.8, 0.4, 0.7, 9.2, 1.2],
    ]
    cli._write_epoch_curves(str(tmp_path), rows)
    # fresh start ignores old rows
    assert cli._load_existing_curve(str(tmp_path), 0) == []
    # resume at epoch 2 keeps epochs 0-1
    got = cli._load_existing_curve(str(tmp_path), 2)
    assert [r[0] for r in got] == [0, 1]
    assert got[1][1:] == [float(v) for v in rows[1][1:]]


def test_email_stats_table(monkeypatch):
    sent = {}

    def fake_send(address, subject, body):
        sent.update(address=address, subject=subject, body=body)
        return True

    monkeypatch.setattr("stgx.utils.notify.send_mail", fake_send)
    curve = [
        [0, 1.5, 0.1, 2.0, 0.2, 0.3, 0.6, 0.25, 0.55, 10.0, 2.0],
        [1, 1.2, 0.1, 1.8, 0.2, 0.4, 0.7, 0.35, 0.65, 11.0, 2.1],
    ]
    cli._email_stats_table({"email": "a@b.c", "jobname": "jobx"}, curve)
    assert sent["address"] == "a@b.c"
    assert "jobx" in sent["subject"]
    lines = sent["body"].splitlines()
    assert lines[0].split() == [
        "EPOCH", "LOSS_TRAIN", "LOSS_VAL", "TOP1_TRAIN", "TOP5_TRAIN",
        "TOP1_VAL", "TOP5_VAL", "TIME_TRAIN", "TIME_VAL",
    ]
    # newest epoch first, like the reference's insert(0) ordering
    assert lines[1].split()[0] == "1"
    assert lines[2].split()[0] == "0"
