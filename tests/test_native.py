"""Native async checkpoint writer: format, CRC recovery, append-resume."""
import os
import pickle

from cmblensing_tpu.native import CheckpointWriter, read_records, scan_count


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "chk")
    with CheckpointWriter(path) as w:
        for i in range(50):
            w.write(pickle.dumps({"i": i}))
        w.flush()
    recs = read_records(path)
    assert len(recs) == 50
    assert pickle.loads(recs[-1])["i"] == 49
    assert scan_count(path) == 50


def test_crash_truncation_recovery(tmp_path):
    path = str(tmp_path / "chk")
    with CheckpointWriter(path) as w:
        for i in range(10):
            w.write(b"x" * 100)
        w.flush()
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 33)  # corrupt the last record
    assert len(read_records(path)) == 9
    # append after crash: corrupt tail is truncated, new record reachable
    with CheckpointWriter(path, append=True) as w:
        w.write(b"tail")
        w.flush()
    recs = read_records(path)
    assert len(recs) == 10
    assert recs[-1] == b"tail"


def test_async_queue(tmp_path):
    path = str(tmp_path / "chk")
    w = CheckpointWriter(path)
    big = b"y" * (1 << 20)
    for _ in range(20):
        w.write(big)
    w.flush()
    w.close()
    assert scan_count(path) == 20
