"""logs-send (Command/Logs/Send.php): batched log draining over an
injected mailer — batch boundaries, truncation, delete-after-send,
failure keeps the store intact."""

from __future__ import annotations

import json

import pytest

from recordmanager_spark.examples.log_sender import (
    MARKER,
    file_log_store,
    send_logs,
)


def _store(tmp_path, n, msg="hello"):
    path = str(tmp_path / "log.jsonl")
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(
                json.dumps(
                    {
                        "_id": i,
                        "timestamp": 1717243200 + i,
                        "pid": 42,
                        "level": 3,
                        "context": "harvest",
                        "message": f"{msg} {i}",
                    }
                )
                + "\n"
            )
    return path


class Recorder:
    def __init__(self, fail_at=None):
        self.sent = []
        self.fail_at = fail_at

    def __call__(self, recipient, subject, body):
        if self.fail_at is not None and len(self.sent) == self.fail_at:
            return False
        self.sent.append((recipient, subject, body))
        return True


def test_batches_format_and_drain(tmp_path):
    path = _store(tmp_path, 250)
    read, delete = file_log_store(path)
    m = Recorder()
    n = send_logs(read, delete, m, "ops@example.org", batch_size=100)
    assert n == 250
    assert len(m.sent) == 3  # 100 + 100 + 50
    assert all(r == "ops@example.org" for r, _, _ in m.sent)
    assert all(s.startswith("RecordManager Log Report (") for _, s, _ in m.sent)
    body = m.sent[0][2]
    assert body.startswith("RecordManager log summary:")
    # reference line shape: ts [pid] [LEVEL] [context] message
    assert "2024-06-01 12:00:00 [42] [WARNING] [harvest] hello 0" in body
    # store fully drained
    assert read(10) == []


def test_long_message_truncated(tmp_path):
    path = _store(tmp_path, 1, msg="x" * 9000)
    read, delete = file_log_store(path)
    m = Recorder()
    send_logs(read, delete, m, "a@b")
    body = m.sent[0][2]
    assert MARKER in body
    # head + marker + tail, not the full 9k
    assert len(body) < 6000


def test_failed_send_aborts_without_deleting(tmp_path):
    path = _store(tmp_path, 150)
    read, delete = file_log_store(path)
    m = Recorder(fail_at=1)  # first batch ok, second fails
    with pytest.raises(RuntimeError, match="Failed to send email"):
        send_logs(read, delete, m, "a@b", batch_size=100)
    # first 100 deleted, failed batch of 50 still stored for the re-run
    assert len(read(1000)) == 50


def test_cli_logs_send_file_sink(tmp_path, capsys):
    from recordmanager_spark.cli import main

    path = _store(tmp_path, 5)
    out = str(tmp_path / "reports")
    main(
        [
            "logs-send", "ops@example.org", "--log-store", path,
            "--out", out, "--batch-size", "2",
        ]
    )
    assert "Completed with 5 message(s) sent" in capsys.readouterr().out
    import os

    assert sorted(os.listdir(out)) == [
        "report00000.txt", "report00001.txt", "report00002.txt",
    ]
    assert "To: ops@example.org" in open(f"{out}/report00000.txt").read()


def test_records_without_ids_drain_exactly(tmp_path):
    """Deletion is by line position: a store whose records carry no _id
    (or duplicate ids) must lose exactly the mailed lines, never the
    unsent tail (r11 review finding)."""
    path = str(tmp_path / "log.jsonl")
    with open(path, "w") as fh:
        for i in range(150):
            fh.write(json.dumps({"timestamp": 0, "message": f"m{i}"}) + "\n")
    read, delete = file_log_store(path)
    m = Recorder(fail_at=1)  # batch 1 ok, batch 2 fails
    with pytest.raises(RuntimeError):
        send_logs(read, delete, m, "a@b", batch_size=100)
    left = read(1000)
    assert len(left) == 50  # only the mailed 100 were deleted
    assert left[0]["message"] == "m100"
    # resume drains the rest
    m2 = Recorder()
    assert send_logs(read, delete, m2, "a@b", batch_size=100) == 50
