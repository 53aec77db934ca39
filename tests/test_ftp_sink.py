"""K3/K4 FTP sink protocol tests with an in-memory fake FTP server."""

from __future__ import annotations

from pathlib import Path

import pytest

from sparkstreamingflume_spark.extensions import ftp_sink as FS

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow


class FakeFTP:
    """Records the protocol calls; optionally fails the first N uploads."""

    def __init__(self, store: dict, fail_first: int = 0, state: dict | None = None):
        self.store = store
        self.dirs: set[str] = set()
        self.fail_first = fail_first
        self.state = state if state is not None else {"attempts": 0}

    def mkd(self, d):
        if d in self.dirs:
            raise OSError("exists")
        self.dirs.add(d)

    def storbinary(self, cmd, fh):
        assert cmd.startswith("STOR ")
        self.state["attempts"] += 1
        if self.state["attempts"] <= self.fail_first:
            raise ConnectionError("flaky network")
        self.store[cmd[5:]] = fh.read()

    def rename(self, src, dst):
        self.store[dst] = self.store.pop(src)

    def quit(self):
        pass


def test_tmp_rename_commit_protocol():
    store: dict = {}
    ok = FS.write_with_retry(
        FS.FtpConfig(host="x"),
        "/data/20240101",
        "part-0",
        b"abc\n",
        client_factory=lambda cfg: FakeFTP(store),
    )
    assert ok
    # final name present, no @tmp remnant (atomic publish)
    assert store == {"/data/20240101/part-0": b"abc\n"}


def test_retry_then_success():
    store: dict = {}
    state = {"attempts": 0}
    ok = FS.write_with_retry(
        FS.FtpConfig(host="x", retry_times=3),
        "/d",
        "f",
        b"p",
        client_factory=lambda cfg: FakeFTP(store, fail_first=2, state=state),
        sleep_s=0,
    )
    assert ok and state["attempts"] == 3
    assert store["/d/f"] == b"p"


def test_dead_letter_fallback(tmp_path):
    store: dict = {}
    cfg = FS.FtpConfig(
        host="x", retry_times=2, dead_letter_dir=str(tmp_path / "dlq")
    )
    ok = FS.write_with_retry(
        cfg,
        "/d",
        "lost",
        b"payload",
        client_factory=lambda cfg: FakeFTP(store, fail_first=99),
        sleep_s=0,
    )
    assert not ok
    assert store == {}  # nothing half-written on the server
    assert (tmp_path / "dlq" / "lost").read_bytes() == b"payload"  # data kept


def test_foreach_partition_writer_groups_and_flushes(spark, tmp_path):
    """Runs on executor workers — the fake must be (a) defined locally so
    cloudpickle ships it by value and (b) file-backed so writes from the
    worker process are observable from the test process."""
    root = str(tmp_path / "ftp_root")

    class FileFTP:
        # in-closure fake: STOR/rename against a local dir
        def mkd(self, d):
            p = Path(root + d)
            if p.exists():
                raise OSError("exists")
            p.mkdir(parents=True)

        def storbinary(self, cmd, fh):
            Path(root + cmd[5:]).write_bytes(fh.read())

        def rename(self, src, dst):
            Path(root + src).rename(root + dst)

        def quit(self):
            pass

    cfg = FS.FtpConfig(host="x", retry_times=1)
    writer = FS.foreach_partition_writer(
        cfg,
        directory_for=lambda row: f"/out/{row['grp']}",
        name_for=lambda pid, n: f"p{pid}-{n}",
        flush_records=3,
        client_factory=lambda cfg: FileFTP(),
    )
    df = spark.createDataFrame(
        [("a", f"line{i}") for i in range(5)] + [("b", "lineB")],
        ["grp", "value"],
    ).coalesce(1).sortWithinPartitions("grp")
    df.foreachPartition(writer)

    files = sorted(p for p in Path(root).rglob("*") if p.is_file())
    assert not [p for p in files if p.name.endswith("@tmp")]  # all committed
    # group a: 5 records -> flush at 3 + key-change flush of 2; group b: 1
    assert [str(p.parent.relative_to(root)) for p in files] == [
        "out/a",
        "out/a",
        "out/b",
    ]
    payload = b"".join(p.read_bytes() for p in files)
    assert payload.count(b"line") == 6
